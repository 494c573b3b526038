import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.baselines import (
    apply_neuron_masks,
    esd_param_mask,
    make_esd_step,
    uce_edit,
    wanda_masks,
)
from unlearn_ft_tpu.baselines.concept_prune import collect_ffn_activations, union_masks
from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec
from unlearn_ft_tpu.schedulers import DiffusionSchedule
from unlearn_ft_tpu.training.optim import make_optimizer


@pytest.fixture(scope="module")
def unet_setup():
    cfg = UNetConfig(
        sample_size=4,
        block_out_channels=(16, 32),
        layers_per_block=2,
        num_attention_heads=(2, 4),
        cross_attention_dim=16,
        norm_num_groups=4,
        ff_gate_width=4,
        upcast_attention=False,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    spec = build_unet_spec(cfg)
    unet = UNet2DConditionModel(spec)
    x = jnp.zeros((1, 4, 4, 4))
    ctx = jnp.zeros((1, 7, 16))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.array([0]), ctx)["params"]
    return cfg, spec, unet, params


def test_uce_edit_changes_only_cross_attn(unet_setup):
    cfg, spec, unet, params = unet_setup
    rng = np.random.default_rng(0)
    old = rng.standard_normal((2, 16)).astype(np.float32)
    new = rng.standard_normal((2, 16)).astype(np.float32)
    keep = rng.standard_normal((3, 16)).astype(np.float32)
    edited = uce_edit(params, spec, old, new, keep, lamb=0.5)

    # attn2 kernels changed, attn1 untouched
    tb = "transformer_blocks_0"
    a_old = np.asarray(params["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"])
    a_new = np.asarray(edited["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"])
    assert not np.allclose(a_old, a_new)
    s_old = np.asarray(params["down_blocks_0"]["attentions_0"][tb]["attn1"]["to_q"]["kernel"])
    s_new = np.asarray(edited["down_blocks_0"]["attentions_0"][tb]["attn1"]["to_q"]["kernel"])
    np.testing.assert_array_equal(s_old, s_new)

    # edited projection maps old concept ~ to the new concept's value
    W = a_new.T  # [inner, d]
    W0 = a_old.T
    want = W0 @ new[0]
    got = W @ old[0]
    # soft edit (lamb + preservation) => directionally close
    cos = np.dot(want, got) / (np.linalg.norm(want) * np.linalg.norm(got))
    assert cos > 0.9


def test_uce_edit_tensor_technique_orthogonalizes(unet_setup):
    """technique='tensor' (train_erase.py:282-291): the target value is the
    new concept's value with its component along the old concept's value
    direction removed, so the edited W maps the old concept nearly
    orthogonal to its original value direction."""
    cfg, spec, unet, params = unet_setup
    rng = np.random.default_rng(1)
    old = rng.standard_normal((1, 16)).astype(np.float32)
    new = rng.standard_normal((1, 16)).astype(np.float32)
    edited = uce_edit(params, spec, old, new, lamb=0.1, technique="tensor")

    tb = "transformer_blocks_0"
    W0 = np.asarray(
        params["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_v"]["kernel"]
    ).T
    W = np.asarray(
        edited["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_v"]["kernel"]
    ).T
    u = W0 @ old[0]
    u = u / np.linalg.norm(u)
    got = W @ old[0]
    # the replace technique keeps the new value's component along u; tensor
    # removes it: |cos(got, u)| shrinks vs replace's
    got_replace = (
        np.asarray(
            uce_edit(params, spec, old, new, lamb=0.1)["down_blocks_0"]["attentions_0"][
                tb
            ]["attn2"]["to_v"]["kernel"]
        ).T
        @ old[0]
    )
    cos_tensor = abs(np.dot(got, u) / np.linalg.norm(got))
    cos_replace = abs(np.dot(got_replace, u) / np.linalg.norm(got_replace))
    assert cos_tensor < cos_replace


def test_uce_edit_covers_all_transformer_layers():
    """SDXL-style multi-layer transformers: every layer's attn2 must be
    edited (reference collects transformer.attn2 per transformer_block,
    train_erase.py:191-210) — round-1 only touched transformer_blocks_0."""
    cfg = UNetConfig(
        sample_size=4,
        # equal widths: layers_per_block=1 would otherwise put a depth gate
        # on a channel-changing down resnet, which build_unet_spec rejects
        block_out_channels=(16, 16),
        layers_per_block=1,
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
    spec = build_unet_spec(cfg)
    unet = UNet2DConditionModel(spec)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)), jnp.array([0]),
        jnp.zeros((1, 7, 16)),
        added_cond={"text_embeds": jnp.zeros((1, 12)), "time_ids": jnp.zeros((1, 6))},
    )["params"]
    rng = np.random.default_rng(0)
    old = rng.standard_normal((1, 16)).astype(np.float32)
    new = rng.standard_normal((1, 16)).astype(np.float32)
    edited = uce_edit(params, spec, old, new, lamb=0.5)
    block = "down_blocks_1"
    for li in range(spec.down[1].transformers[0].num_layers):
        tb = f"transformer_blocks_{li}"
        a_old = np.asarray(params[block]["attentions_0"][tb]["attn2"]["to_v"]["kernel"])
        a_new = np.asarray(edited[block]["attentions_0"][tb]["attn2"]["to_v"]["kernel"])
        assert not np.allclose(a_old, a_new), f"layer {li} not edited"


def test_uce_debias_edit_zero_weights_is_identity(unet_setup):
    """With all attribute weights zero the debias target equals the concept's
    own projection, and the closed form reduces to W' = W exactly."""
    from unlearn_ft_tpu.baselines.uce import debias_weight_update, uce_debias_edit

    cfg, spec, unet, params = unet_setup
    rng = np.random.default_rng(1)
    concept = rng.standard_normal((3, 16)).astype(np.float32)  # 3-token span
    attrs = [rng.standard_normal((3, 16)).astype(np.float32) for _ in range(2)]
    edited = uce_debias_edit(
        params, spec, [concept], [attrs], [np.zeros(2)], lamb=0.1, erase_scale=0.1
    )
    tb = "transformer_blocks_0"
    a_old = np.asarray(params["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"])
    a_new = np.asarray(edited["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"])
    np.testing.assert_allclose(a_old, a_new, atol=1e-5)

    # nonzero weights move the kernel
    edited2 = uce_debias_edit(
        params, spec, [concept], [attrs], [np.array([0.3, -0.3])], lamb=0.1,
        erase_scale=0.1,
    )
    a_new2 = np.asarray(edited2["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"])
    assert not np.allclose(a_old, a_new2)

    # controller: converged concepts get zero delta
    delta, conv = debias_weight_update(np.array([[0.52, 0.48], [0.9, 0.1]]))
    assert conv[0] and not conv[1]
    assert np.all(delta[0] == 0) and delta[1, 1] > 0


def test_overlay_accepts_reference_torch_formats(unet_setup, tmp_path):
    """ESD FineTunedModel nested .pt (unet.-prefixed, {'weight','bias'} leafs)
    and flat diffusers-naming state dicts both overlay correctly with the
    right transposes (generate_fid_images.py:97-111)."""
    torch = pytest.importorskip("torch")
    from unlearn_ft_tpu.baselines.overlay import apply_erasure_overlay

    cfg, spec, unet, params = unet_setup
    tb = params["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["attn2"]
    k_kernel = np.asarray(tb["to_k"]["kernel"])  # [d_text, inner]
    rng = np.random.default_rng(0)
    new_w = rng.standard_normal((k_kernel.shape[1], k_kernel.shape[0])).astype(np.float32)

    # ESD nested format
    esd_sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k": {
            "weight": torch.tensor(new_w)
        }
    }
    esd_path = tmp_path / "esd_overlay.pt"
    torch.save(esd_sd, esd_path)
    out = apply_erasure_overlay(params, spec, str(esd_path))
    got = np.asarray(
        out["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["attn2"]["to_k"]["kernel"]
    )
    np.testing.assert_allclose(got, new_w.T)
    # untouched elsewhere
    np.testing.assert_array_equal(
        np.asarray(out["conv_in"]["kernel"]), np.asarray(params["conv_in"]["kernel"])
    )

    # flat diffusers format: conv [o,i,h,w] and norm weight->scale
    conv_k = np.asarray(params["conv_in"]["kernel"])  # [h,w,i,o]
    new_conv = rng.standard_normal(
        (conv_k.shape[3], conv_k.shape[2], conv_k.shape[0], conv_k.shape[1])
    ).astype(np.float32)
    norm_scale = np.asarray(
        params["down_blocks_0"]["resnets_0"]["norm1"]["scale"]
    )
    flat_sd = {
        "conv_in.weight": torch.tensor(new_conv),
        "down_blocks.0.resnets.0.norm1.weight": torch.tensor(norm_scale * 2),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.bias": torch.tensor(
            np.asarray(
                params["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["ff"][
                    "net_0"
                ]["proj"]["bias"]
            )
            + 1
        ),
    }
    flat_path = tmp_path / "uce_overlay.pt"
    torch.save(flat_sd, flat_path)
    out2 = apply_erasure_overlay(params, spec, str(flat_path))
    np.testing.assert_allclose(
        np.asarray(out2["conv_in"]["kernel"]), new_conv.transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(
        np.asarray(out2["down_blocks_0"]["resnets_0"]["norm1"]["scale"]), norm_scale * 2
    )

    # bogus keys fail loudly in strict mode, are skipped otherwise
    bad_path = tmp_path / "bad.pt"
    torch.save({"nonexistent.module.weight": torch.zeros(3, 3),
                "conv_in.weight": torch.tensor(new_conv)}, bad_path)
    with pytest.raises(ValueError):
        apply_erasure_overlay(params, spec, str(bad_path))
    out3 = apply_erasure_overlay(params, spec, str(bad_path), strict=False)
    np.testing.assert_allclose(
        np.asarray(out3["conv_in"]["kernel"]), new_conv.transpose(2, 3, 1, 0)
    )


def test_esd_mask_and_step(unet_setup):
    cfg, spec, unet, params = unet_setup
    mask = esd_param_mask(params, "noxattn")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    xattn = [v for p, v in flat if "attn2" in "/".join(str(k) for k in p)]
    assert xattn and not any(xattn)
    other = [v for p, v in flat if "attn1" in "/".join(str(k) for k in p)]
    assert all(other)

    from unlearn_ft_tpu.baselines.esd import masked_optimizer

    tx = masked_optimizer(make_optimizer(1e-4), mask)
    step = make_esd_step(unet, DiffusionSchedule(), tx, ddim_steps=4)
    opt_state = tx.init(params)
    concept = jnp.asarray(np.random.default_rng(1).standard_normal((1, 7, 16)), jnp.float32)
    neutral = jnp.zeros((1, 7, 16))
    frozen = jax.tree.map(jnp.copy, params)
    p1, o1, loss = step(jax.tree.map(jnp.copy, params), frozen, opt_state, concept, neutral,
                        jax.random.PRNGKey(0), latent_hw=4)
    assert np.isfinite(float(loss))
    # cross-attn unchanged under noxattn
    tb = "transformer_blocks_0"
    np.testing.assert_array_equal(
        np.asarray(p1["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"]),
        np.asarray(params["down_blocks_0"]["attentions_0"][tb]["attn2"]["to_k"]["kernel"]),
    )
    # self-attn trained
    assert not np.array_equal(
        np.asarray(p1["down_blocks_0"]["attentions_0"][tb]["attn1"]["to_q"]["kernel"]),
        np.asarray(params["down_blocks_0"]["attentions_0"][tb]["attn1"]["to_q"]["kernel"]),
    )


def test_concept_prune_wanda(unet_setup):
    cfg, spec, unet, params = unet_setup
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 4)), jnp.float32)
    ctx_base = jnp.asarray(np.random.default_rng(1).standard_normal((2, 7, 16)), jnp.float32)
    ctx_tgt = jnp.asarray(np.random.default_rng(2).standard_normal((2, 7, 16)), jnp.float32)
    t = jnp.array([100, 200])

    base = collect_ffn_activations(unet, params, x, t, ctx_base)
    tgt = collect_ffn_activations(unet, params, x, t, ctx_tgt)
    assert base and set(base) == set(tgt)

    masks = wanda_masks(params, spec, base, tgt, skill_ratio=0.1)
    assert any(m.any() for m in masks.values())
    u = union_masks([masks, masks])
    assert all(np.array_equal(u[k], masks[k]) for k in masks)

    pruned = apply_neuron_masks(params, masks)
    # zeroed neurons: GEGLU proj columns are zero where masked
    path = next(iter(masks))
    node = pruned
    for p in path.split("/"):
        node = node[p]
    kern = node["proj"]["kernel"]
    m = masks[path]
    col = np.concatenate([m, m])
    assert np.all(kern[:, col] == 0)
    # model still runs
    out = unet.apply({"params": pruned}, x, t, ctx_base)
    assert np.isfinite(np.asarray(out)).all()
