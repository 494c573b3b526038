"""Packed-dispatch boundary: flat-buffer pack/unpack round trips and
numerical equivalence of the packed train steps with the tree-boundary
steps (utils/packing.py — a TPU dispatch-overhead optimization with no
reference counterpart)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from unlearn_ft_tpu.utils.packing import (
    make_pack_spec, pack, pack_host, unpack, make_packed_step,
)


def _tree():
    return {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {"w": jnp.ones((2, 2, 2), jnp.bfloat16) * 1.5,
              "count": jnp.asarray(7, jnp.int32)},
        "c": jnp.linspace(-1, 1, 5, dtype=jnp.float32),
    }


def test_pack_unpack_round_trip_mixed_dtypes():
    tree = _tree()
    spec = make_pack_spec(tree)
    assert set(spec.sizes) == {"float32", "bfloat16", "int32"}
    assert spec.sizes["float32"] == 17 and spec.sizes["int32"] == 1
    out = unpack(pack(tree, spec), spec)
    chex_equal = jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        tree, out)
    del chex_equal
    # scalar leaf keeps its shape
    assert out["b"]["count"].shape == ()
    assert out["b"]["count"].dtype == jnp.int32


def test_pack_host_matches_device_pack():
    tree = _tree()
    spec = make_pack_spec(tree)
    dev = pack(tree, spec)
    host = pack_host(tree, spec)
    for b in spec.sizes:
        np.testing.assert_array_equal(np.asarray(dev[b]), host[b])


def test_pack_under_jit_and_optax_state():
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    tx = optax.adamw(1e-3)
    state = tx.init(params)
    spec = make_pack_spec(state)
    flat = jax.jit(lambda s: pack(s, spec))(state)
    rt = jax.jit(lambda f: unpack(f, spec))(flat)
    for x, y in zip(jax.tree.leaves(state), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def tiny_setup():
    from unlearn_ft_tpu.models import UNet2DConditionModel, UNetConfig, build_unet_spec
    from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig
    from unlearn_ft_tpu.schedulers import DiffusionSchedule

    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(16, 16),
        layers_per_block=1,
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
    vae = AutoencoderKL(VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                                  norm_num_groups=4))
    sched = DiffusionSchedule()
    key = jax.random.PRNGKey(0)
    params = unet.init(key, jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                       jnp.zeros((1, 7, 16)))["params"]
    vparams = vae.init(key, jnp.zeros((1, 16, 16, 3)), key)["params"]
    rng = np.random.default_rng(0)
    batch = {
        "latent_moments": jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32),
    }
    return unet, unet, vae, sched, params, params, vparams, batch


def test_packed_finetune_step_matches_tree_step(tiny_setup):
    """N packed steps == N tree steps bit-for-bit on CPU (same rng, same
    batch): the packed boundary must not change numerics."""
    from unlearn_ft_tpu.training.steps import (
        LossConfig, make_finetune_step, make_packed_finetune_step,
        make_packed_upper_step, make_upper_step,
    )

    student, teacher, vae, sched, params, tparams, vparams, batch = tiny_setup
    # the steps donate the student params, which in this fixture alias the
    # frozen teacher tree — give the student its own buffers
    params = jax.tree.map(jnp.copy, params)
    loss_cfg = LossConfig(distillation_weight=2.0, block_weight=0.1)
    tx = optax.adamw(1e-4)

    frozen = {"teacher": tparams, "vae": vparams}
    param_spec = make_pack_spec(params)
    opt_spec = make_pack_spec(tx.init(params))
    frozen_spec = make_pack_spec(frozen)

    step = make_finetune_step(student, teacher, vae, sched, loss_cfg, tx)
    pstep = make_packed_finetune_step(
        student, teacher, vae, sched, loss_cfg, tx,
        param_spec, opt_spec, frozen_spec)

    p_t, o_t = params, tx.init(params)
    p_f = pack(params, param_spec)
    o_f = pack(tx.init(params), opt_spec)
    f_f = pack(frozen, frozen_spec)
    for i in range(2):
        key = jax.random.PRNGKey(i)
        p_t, o_t, m_t = step(p_t, o_t, frozen, batch, key)
        p_f, o_f, m_f = pstep(p_f, o_f, f_f, batch, key)
        assert np.allclose(float(m_t["loss"]), float(m_f["loss"]), rtol=1e-6)
    un = unpack(p_f, param_spec)
    for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(un)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    # upper step too (same boundary, ESD core)
    utx = optax.adamw(5e-5)
    uspec = make_pack_spec(utx.init(params))
    ustep = make_upper_step(student, teacher, vae, sched, loss_cfg, utx)
    pustep = make_packed_upper_step(
        student, teacher, vae, sched, loss_cfg, utx,
        param_spec, uspec, frozen_spec)
    ub = dict(batch)
    ub["empty_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
    key = jax.random.PRNGKey(9)
    # pack BEFORE the tree step donates p_t's buffers
    p_f_in = pack(p_t, param_spec)
    o_f_in = pack(utx.init(p_t), uspec)
    p_t2, _, m_t = ustep(jax.tree.map(jnp.copy, p_t), utx.init(p_t), frozen, ub, key)
    p_f2, _, m_f = pustep(p_f_in, o_f_in, f_f, ub, key)
    assert np.allclose(float(m_t["upper_loss"]), float(m_f["upper_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_t2), jax.tree.leaves(unpack(p_f2, param_spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_partial_packing_threshold():
    """Leaves above max_leaf_bytes pass through unpacked (dispatch cost is
    per buffer, not per byte — partial packing bounds the copy overhead)."""
    tree = {
        "big": jnp.ones((1024, 64), jnp.float32),   # 256KB -> passthrough
        "small": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "tiny": jnp.asarray(3, jnp.int32),
    }
    spec = make_pack_spec(tree, max_leaf_bytes=1024)
    assert spec.n_rest == 1
    assert spec.sizes == {"float32": 6, "int32": 1}
    flat = pack(tree, spec)
    assert len(flat["_rest"]) == 1 and flat["_rest"][0].shape == (1024, 64)
    rt = unpack(flat, spec)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # passthrough leaves are the SAME buffers (zero copies)
    assert rt["big"] is tree["big"]
    # host pack agrees
    host = pack_host(tree, spec)
    np.testing.assert_array_equal(np.asarray(flat["float32"]), host["float32"])
    np.testing.assert_array_equal(host["_rest"][0], np.asarray(tree["big"]))


def test_packed_step_partial_threshold(tiny_setup):
    """The packed step also matches with a partial-packing spec."""
    from unlearn_ft_tpu.training.steps import (
        LossConfig, make_finetune_step, make_packed_finetune_step,
    )

    student, teacher, vae, sched, params, tparams, vparams, batch = tiny_setup
    params = jax.tree.map(jnp.copy, params)
    loss_cfg = LossConfig()
    tx = optax.adamw(1e-4)
    frozen = {"teacher": tparams, "vae": vparams}
    thr = 2048  # splits the tiny tree into packed + passthrough
    param_spec = make_pack_spec(params, max_leaf_bytes=thr)
    assert param_spec.n_rest > 0 and param_spec.sizes  # genuinely mixed
    opt_spec = make_pack_spec(tx.init(params), max_leaf_bytes=thr)
    frozen_spec = make_pack_spec(frozen, max_leaf_bytes=thr)

    step = make_finetune_step(student, teacher, vae, sched, loss_cfg, tx)
    pstep = make_packed_finetune_step(
        student, teacher, vae, sched, loss_cfg, tx,
        param_spec, opt_spec, frozen_spec)
    key = jax.random.PRNGKey(3)
    # partial packing passes large leaves through WITHOUT copying, so the
    # packed input shares buffers with `params` — copy per consumer since
    # both steps donate their inputs
    cp = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    p_f, o_f, m_f = pstep(pack(cp(params), param_spec),
                          pack(tx.init(params), opt_spec),
                          pack(frozen, frozen_spec), batch, key)
    p_t, o_t, m_t = step(cp(params), tx.init(params), frozen, batch, key)
    assert np.allclose(float(m_t["loss"]), float(m_f["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(unpack(p_f, param_spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_frozen_only_packed_step_matches_tree_step(tiny_setup):
    """frozen_spec= on the plain step makers (frozen towers packed, donated
    param/opt boundary unchanged) must reproduce the tree step exactly.
    Measured neutral on v5e (39.93 vs 39.94 samples/s) — kept as the
    zero-risk configuration for dispatch-bound workloads."""
    from unlearn_ft_tpu.training.steps import (
        LossConfig, make_finetune_step, make_upper_step,
    )

    student, teacher, vae, sched, params, tparams, vparams, batch = tiny_setup
    params = jax.tree.map(jnp.copy, params)
    loss_cfg = LossConfig(distillation_weight=2.0)
    tx = optax.adamw(1e-4)
    frozen = {"teacher": tparams, "vae": vparams}
    frozen_spec = make_pack_spec(frozen)
    f_f = pack(frozen, frozen_spec)

    step = make_finetune_step(student, teacher, vae, sched, loss_cfg, tx)
    fstep = make_finetune_step(student, teacher, vae, sched, loss_cfg, tx,
                               frozen_spec=frozen_spec)
    cp = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    key = jax.random.PRNGKey(5)
    p_t, o_t, m_t = step(cp(params), tx.init(params), frozen, batch, key)
    p_f, o_f, m_f = fstep(cp(params), tx.init(params), f_f, batch, key)
    assert np.allclose(float(m_t["loss"]), float(m_f["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    utx = optax.adamw(5e-5)
    ub = dict(batch)
    ub["empty_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
    ustep = make_upper_step(student, teacher, vae, sched, loss_cfg, utx)
    fustep = make_upper_step(student, teacher, vae, sched, loss_cfg, utx,
                             frozen_spec=frozen_spec)
    key = jax.random.PRNGKey(6)
    p_t2, _, m_t = ustep(cp(p_t), utx.init(p_t), frozen, ub, key)
    p_f2, _, m_f = fustep(cp(p_t), utx.init(p_t), f_f, ub, key)
    assert np.allclose(float(m_t["upper_loss"]), float(m_f["upper_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_t2), jax.tree.leaves(p_f2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
