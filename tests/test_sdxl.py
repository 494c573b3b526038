"""SDXL-style U-Net: multi-layer transformers + text_time conditioning."""
import jax
import jax.numpy as jnp
import numpy as np

from unlearn_ft_tpu.models import (
    UNet2DConditionModel,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
    materialize_pruned,
)


def tiny_sdxl_config():
    return UNetConfig(
        sample_size=8,
        block_out_channels=(16, 32),
        layers_per_block=2,
        transformer_layers_per_block=(1, 2),
        num_attention_heads=(2, 4),
        cross_attention_dim=16,
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("DownBlock2DHalfGated", "CrossAttnDownBlock2DHalfGated"),
        up_block_types=("CrossAttnUpBlock2DHalfGated", "UpBlock2DHalfGated"),
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 12,
    )


def test_sdxl_layout_counts():
    cfg = tiny_sdxl_config()
    layout = gate_layout_for_config(cfg)
    spec = build_unet_spec(cfg)
    # down CrossAttn block (2nd): 2 transformers x 2 layers x 3 gates = 12
    b1 = layout.blocks[1]
    tf_widths = [s for s in b1.submodules if s.kind == "transformer"]
    assert all(len(s.widths) == 6 for s in tf_widths)  # 2 layers x (h,h,ff)
    assert spec.down[1].transformers[0].num_layers == 2
    # mid inherits the deepest transformer stack
    assert spec.mid.transformers[0].num_layers == 2


def test_sdxl_forward_and_prune():
    cfg = tiny_sdxl_config()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    model = UNet2DConditionModel(spec)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    t = jnp.array([3, 500])
    added = {
        "text_embeds": jnp.ones((2, 12)),
        "time_ids": jnp.tile(jnp.arange(6.0)[None], (2, 1)),
    }
    params = model.init(jax.random.PRNGKey(2), x, t, ctx, added_cond=added)["params"]
    assert "add_embedding" in params
    out = model.apply({"params": params}, x, t, ctx, added_cond=added)
    assert out.shape == x.shape and jnp.isfinite(out).all()

    # gated forward with the full layout + materialization round-trip
    ones = layout.ones(2)
    out_g = model.apply({"params": params}, x, t, ctx, ones, added_cond=added)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out), atol=1e-5)

    arch = layout.random_arch_vector(0.5, seed=3)
    pruned_spec, pruned_params = materialize_pruned(spec, layout, params, arch)
    pruned = UNet2DConditionModel(pruned_spec)
    out_p = pruned.apply({"params": pruned_params}, x, t, ctx, added_cond=added)
    assert out_p.shape == x.shape and jnp.isfinite(out_p).all()
    # per-layer head counts may differ within one transformer
    t0 = pruned_spec.down[1].transformers[0]
    assert len(t0.heads) == 2


def test_sdxl_macs():
    from unlearn_ft_tpu.utils.macs import calc_macs, unet_macs

    cfg = tiny_sdxl_config()
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    table = unet_macs(spec, seq_kv=7)
    d = calc_macs(spec, layout.ones(2), seq_kv=7, static_table=table)
    assert np.isfinite(np.asarray(d["cur_prunable"])).all()
