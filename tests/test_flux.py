import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.models.flux import (
    FluxConfig,
    GatedFluxTransformer2DModel,
    flux_gate_layout,
    make_image_ids,
    pack_latents,
    unpack_latents,
)


def tiny_flux():
    return FluxConfig(
        in_channels=8,
        num_layers=2,
        num_single_layers=2,
        attention_head_dim=8,
        num_attention_heads=2,
        joint_attention_dim=16,
        pooled_projection_dim=12,
        guidance_embeds=True,
        axes_dims_rope=(2, 4, 2),
        ff_gate_width=4,
    )


@pytest.fixture(scope="module")
def flux_setup():
    cfg = tiny_flux()
    layout = flux_gate_layout(cfg)
    model = GatedFluxTransformer2DModel(cfg)
    b, l_img, l_txt = 2, 16, 5
    key = jax.random.PRNGKey(0)
    hidden = jax.random.normal(key, (b, l_img, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, l_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim))
    t = jnp.array([0.5, 0.9])
    img_ids = jnp.asarray(make_image_ids(8, 8, b))
    txt_ids = jnp.zeros((b, l_txt, 3))
    g = jnp.array([3.5, 3.5])
    params = model.init(jax.random.PRNGKey(3), hidden, ctx, pooled, t, img_ids, txt_ids, g)[
        "params"
    ]
    return cfg, layout, model, params, (hidden, ctx, pooled, t, img_ids, txt_ids, g)


def test_flux_layout(flux_setup):
    cfg, layout, *_ = flux_setup
    # 2 joint blocks x3 gates + 2 single x2 gates
    assert len(layout.width_list) == 10
    assert layout.num_depth == 0
    assert layout.width_list == [2, 4, 4, 2, 4, 4, 2, 4, 2, 4]


def test_flux_forward_and_gates(flux_setup):
    cfg, layout, model, params, args = flux_setup
    out = model.apply({"params": params}, *args)
    assert out.shape == (2, 16, cfg.in_channels)
    assert jnp.isfinite(out).all()

    ones = layout.ones(2)
    out_g = model.apply({"params": params}, *args, structure=ones)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out), atol=1e-5)

    soft = layout.split(jnp.full((2, layout.total_dim), 0.5))
    out_s = model.apply({"params": params}, *args, structure=soft)
    assert not np.allclose(np.asarray(out_s), np.asarray(out), atol=1e-4)


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 8, 4)
    p = pack_latents(x)
    assert p.shape == (2, 16, 16)
    np.testing.assert_array_equal(unpack_latents(p, 8, 8), x)


def test_flux_pruner_step(flux_setup):
    from unlearn_ft_tpu.models.hypernet import HyperStructure
    from unlearn_ft_tpu.models.quantizer import QuantizerConfig
    from unlearn_ft_tpu.schedulers import FlowMatchSchedule
    from unlearn_ft_tpu.training.optim import make_optimizer
    from unlearn_ft_tpu.training.steps import LossConfig, make_flux_pruner_step

    cfg, layout, model, params, args = flux_setup
    hidden, ctx, pooled, t, img_ids, txt_ids, g = args
    hn = HyperStructure(layout, input_dim=12)
    hparams = hn.init(jax.random.PRNGKey(4), jnp.zeros((1, 12)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(5))
    qstate = qcfg.init_state(qparams)

    tx = make_optimizer(1e-3)
    step = make_flux_pruner_step(
        model, hn, qcfg, layout, cfg, FlowMatchSchedule(shift=3.0),
        LossConfig(contrastive_weight=1.0, resource_weight=1.0, resource_target=0.7),
        tx, l_img=16, l_txt=5, guidance_scale=3.5,
    )
    trainable = {"hypernet": hparams, "quantizer": qparams}
    opt_state = tx.init(trainable)
    batch = {
        "latents": hidden,
        "prompt_embeds": ctx,
        "pooled_prompt_embeds": pooled,
        "img_ids": img_ids,
        "txt_ids": txt_ids,
        "mpnet_embeddings": jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 12)), jnp.float32
        ),
    }
    t1, o1, qs1, m = step(trainable, opt_state, qstate, {"flux": params}, batch,
                          jax.random.PRNGKey(6))
    assert np.isfinite(float(m["loss"]))
    assert 0 < float(m["resource_ratio"]) <= 1.2


@pytest.mark.parametrize("policy", [None, "dots"])
def test_flux_remat_matches_no_remat_gradients(flux_setup, policy):
    """remat only changes WHAT is saved for backward, never the math
    (same contract as models/unet.py's remat test)."""
    cfg, layout, model, params, args = flux_setup
    rem = GatedFluxTransformer2DModel(cfg, remat=True, remat_policy=policy)

    def loss_fn(m):
        def f(p):
            out = m.apply({"params": p}, *args)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(f))(params)

    base_l, base_g = loss_fn(model)
    rem_l, rem_g = loss_fn(rem)
    np.testing.assert_allclose(float(rem_l), float(base_l), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
        base_g, rem_g,
    )


def test_flux_remat_policy_unknown_raises(flux_setup):
    cfg, layout, model, params, args = flux_setup
    bad = GatedFluxTransformer2DModel(cfg, remat=True, remat_policy="nope")
    with pytest.raises(ValueError, match="remat_policy"):
        bad.apply({"params": params}, *args)
