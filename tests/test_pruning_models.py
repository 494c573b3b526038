import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.losses import contrastive_loss, resource_loss
from unlearn_ft_tpu.models.hypernet import HyperStructure, WeightNormDense, convert_hypernet
from unlearn_ft_tpu.models.quantizer import QuantizerConfig
from unlearn_ft_tpu.utils.arch import sd21_gate_layout, unet_gate_layout
from unlearn_ft_tpu.utils.estimation import hard_concrete


def tiny_layout():
    return unet_gate_layout(
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        mid_block_type="UNetMidBlock2DCrossAttnWidthGated",
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
        num_attention_heads=(2, 4),
        layers_per_block=2,
        ff_gate_width=4,
        resnet_groups=4,
    )


def test_hypernet_forward_shape():
    layout = tiny_layout()
    hn = HyperStructure(layout, input_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    params = hn.init(jax.random.PRNGKey(1), x)["params"]
    out = hn.apply({"params": params}, x)
    assert out.shape == (3, layout.total_dim)


def test_single_arch_param():
    layout = tiny_layout()
    hn = HyperStructure(layout, input_dim=16, single_arch_param=True)
    params = hn.init(jax.random.PRNGKey(0))["params"]
    out = hn.apply({"params": params})
    assert out.shape == (1, layout.total_dim)


def test_weight_norm_dense_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.nn.utils.parametrizations import weight_norm

    torch.manual_seed(0)
    lin = weight_norm(torch.nn.Linear(8, 5, bias=False))
    x = torch.randn(2, 8)
    with torch.no_grad():
        want = lin(x).numpy()
    sd = {f"mh_fc.0.{k}": v for k, v in lin.state_dict().items()}
    layout_stub = type("L", (), {"width_list": [5], "num_depth": 0})()
    params = convert_hypernet(sd, layout_stub)
    # only one layer converted; drop the (empty) depth layer entry
    got = WeightNormDense(5).apply({"params": params["mh_fc_0"]}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def quant():
    layout = tiny_layout()
    cfg = QuantizerConfig(layout=layout, n_e=4)
    params = cfg.init_params(jax.random.PRNGKey(0))
    state = cfg.init_state(params)
    return layout, cfg, params, state


def test_quantizer_shapes_and_eval_hard(quant):
    layout, cfg, params, state = quant
    z = jax.random.normal(jax.random.PRNGKey(2), (5, layout.total_dim))
    key = jax.random.PRNGKey(3)
    zq, idx, new_state = cfg(key, params, state, z, training=True)
    assert zq.shape == (5, layout.total_dim)
    assert idx.shape == (5,) and (idx >= 0).all() and (idx < 4).all()
    assert not np.array_equal(np.asarray(new_state["embedding_gs"]), np.asarray(state["embedding_gs"]))

    zq_eval, idx_eval, _ = cfg(key, params, new_state, z, training=False)
    vals = np.unique(np.asarray(zq_eval))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_sinkhorn_is_assignment(quant):
    layout, cfg, params, state = quant
    out = jax.random.normal(jax.random.PRNGKey(4), (16, 4))
    Q = cfg.sinkhorn(out)
    np.testing.assert_allclose(Q.sum(axis=1), np.ones(16), rtol=1e-4)  # rows sum to 1


def test_width_depth_normalize(quant):
    layout, cfg, params, state = quant
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (2, layout.total_dim)), 0.01, 0.99)
    out = cfg.width_depth_normalize(state, x)
    assert out.shape == x.shape
    # intervals without depth gates are hard 0/1 scaled by 1/sqrt(w)
    a, b = cfg.width_intervals[0]  # first resnet: width-only
    w = layout.width_list[0]
    vals = np.unique(np.asarray(out[:, a:b]))
    allowed = {0.0, float(1 / np.sqrt(w))}
    assert all(any(abs(v - c) < 1e-6 for c in allowed) for v in vals)


def test_quantizer_macs_template(quant):
    layout, cfg, params, state = quant
    per_sub = [[float(i + 1)] * len(s.widths) for i, s in enumerate(layout.submodules)]
    st = cfg.set_prunable_macs_template(state, per_sub)
    assert st["prunable_macs_template"].shape == (layout.total_dim,)


def test_contrastive_loss_matches_torch_bce():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    p = np.random.default_rng(0).standard_normal((6, 8)).astype(np.float32)
    a = np.abs(np.random.default_rng(1).standard_normal((6, 10)).astype(np.float32))
    loss, sim = contrastive_loss(jnp.asarray(p), jnp.asarray(a))
    ta = torch.tensor(a) / torch.tensor(a).norm(dim=1, keepdim=True)
    tp = torch.tensor(p) / torch.tensor(p).norm(dim=1, keepdim=True)
    sim_a = F.softmax(ta @ ta.T, dim=-1)
    sim_p = F.softmax(tp @ tp.T, dim=-1)
    want = F.binary_cross_entropy(sim_a.T, sim_p.T, reduction="mean")
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_resource_loss():
    np.testing.assert_allclose(float(resource_loss(jnp.asarray(0.5), 0.5)), 0.0, atol=1e-7)
    assert float(resource_loss(jnp.asarray(0.7), 0.5)) > 0
    assert float(resource_loss(jnp.asarray(0.3), 0.5)) > 0


def test_macs_accounting():
    from unlearn_ft_tpu.models import UNetConfig, build_unet_spec, gate_layout_for_config
    from unlearn_ft_tpu.utils.macs import calc_macs, unet_macs

    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(16, 32),
        layers_per_block=2,
        num_attention_heads=(2, 4),
        cross_attention_dim=16,
        norm_num_groups=4,
        ff_gate_width=4,
        down_block_types=("CrossAttnDownBlock2DHalfGated", "DownBlock2DHalfGated"),
        up_block_types=("UpBlock2DHalfGated", "CrossAttnUpBlock2DHalfGated"),
    )
    spec = build_unet_spec(cfg)
    layout = gate_layout_for_config(cfg)
    table = unet_macs(spec, seq_kv=7)
    assert table["total"] > table["prunable"] > 0
    assert len(table["per_submodule_prunable"]) == len(layout.submodules)

    ones = layout.ones(2)
    d = calc_macs(spec, ones, seq_kv=7, static_table=table)
    # at full structure, depth-gated submodules contribute their FULL macs to
    # cur_prunable (reference ResnetBlock2DWidthDepthGated.calc_macs:635-638),
    # which is exactly why the trainer rescales the pruning target
    # (trainer.py:1365-1373 update_pruning_target)
    expected = 0.0
    for block, subs in zip(spec.blocks, table["per_block"]):
        gated = list(block.resnets) + list(block.transformers)
        for s, m in zip(gated, subs):
            expected += m.total if s.has_depth_gate else m.prunable
    np.testing.assert_allclose(np.asarray(d["cur_prunable"]), expected, rtol=1e-6)

    half = layout.split(jnp.asarray(np.repeat(layout.random_arch_vector(0.5, seed=0), 2, 0)))
    d2 = calc_macs(spec, half, seq_kv=7, static_table=table)
    assert (np.asarray(d2["cur_prunable"]) < table["prunable"]).all()
    # gradient flows to gates through the STE
    g = jax.grad(
        lambda s: calc_macs(spec, s, seq_kv=7, static_table=table)["cur_prunable"].sum()
    )(half)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in g.width)


def test_sd21_macs_magnitude():
    """Full SD-2.1 U-Net at 64x64 latents should be in the hundreds of GMACs
    (the paper reports ~1 TMACs-scale budgets for SD-2.1 at 512px)."""
    from unlearn_ft_tpu.models import sd21_unet_config, build_unet_spec
    from unlearn_ft_tpu.utils.macs import unet_macs

    table = unet_macs(build_unet_spec(sd21_unet_config()))
    assert 2e11 < table["total"] < 2e12
