"""Low-memory AdamW (bf16 moments + stochastic rounding) — the HBM knob
that fits the bilevel mix's two optimizer states on a 16GB v5e chip."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.training.optim import (
    _stochastic_round,
    make_optimizer,
    scale_by_adam_low_mem,
)


def test_low_mem_fp32_matches_optax_scale_by_adam():
    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)),
                               jnp.float32)}
    a = scale_by_adam_low_mem(mu_dtype=jnp.float32, nu_dtype=jnp.float32)
    b = optax.scale_by_adam()
    sa, sb = a.init(params), b.init(params)
    rng = np.random.default_rng(1)
    for _ in range(5):
        g = {"w": jnp.asarray(rng.standard_normal((8, 4)) * 0.1, jnp.float32)}
        ua, sa = a.update(g, sa)
        ub, sb = b.update(g, sb)
        np.testing.assert_allclose(np.asarray(ua["w"]), np.asarray(ub["w"]),
                                   rtol=1e-6, atol=1e-7)


def test_stochastic_round_unbiased():
    x = jnp.full((20000,), 1.00001e-4, jnp.float32)  # between bf16 grid points
    r = _stochastic_round(x, jnp.bfloat16, jnp.uint32(7)).astype(jnp.float32)
    vals = np.unique(np.asarray(r))
    assert len(vals) == 2  # rounds to the two neighboring bf16 values
    assert vals[0] < 1.00001e-4 < vals[1]
    # unbiased: the mean matches the fp32 value far below bf16 resolution
    assert abs(float(r.mean()) - 1.00001e-4) < 2e-8


def test_bf16_nu_with_sr_tracks_fp32_nu():
    """With b2=0.999 the per-step nu increment is ~1e-3 of its steady state —
    below bf16's deterministic resolution (2^-8). Stochastic rounding keeps
    the accumulation unbiased; nu must reach the fp32 steady state."""
    g = {"w": jnp.full((64, 64), 1e-2, jnp.float32)}
    params = {"w": jnp.zeros((64, 64), jnp.float32)}
    lo = scale_by_adam_low_mem()  # bf16 mu+nu, SR
    hi = optax.scale_by_adam()
    s_lo, s_hi = lo.init(params), hi.init(params)
    for _ in range(300):
        _, s_lo = lo.update(g, s_lo)
        _, s_hi = hi.update(g, s_hi)
    nu_lo = float(jnp.mean(s_lo.nu["w"].astype(jnp.float32)))
    nu_hi = float(jnp.mean(s_hi.nu["w"]))
    assert nu_hi > 0
    assert abs(nu_lo / nu_hi - 1.0) < 0.05, (nu_lo, nu_hi)
    # state memory really is bf16
    assert s_lo.nu["w"].dtype == jnp.bfloat16
    assert s_lo.mu["w"].dtype == jnp.bfloat16


def test_make_optimizer_nu_dtype_end_to_end():
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    tx = make_optimizer(1e-3, weight_decay=0.01, mu_dtype=jnp.bfloat16,
                        nu_dtype=jnp.bfloat16)
    state = tx.init(params)
    g = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
    updates, state = tx.update(g, state, params)
    new = optax.apply_updates(params, updates)
    assert jnp.isfinite(new["w"]).all()
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))


def test_sr_optimizer_convergence_matches_fp32():
    """A/B: 200 AdamW steps on a least-squares problem — bf16+SR moments must
    reach ~the fp32 loss (the low-memory state is a drop-in for training)."""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64,)), jnp.float32)

    def loss_fn(w):
        return jnp.mean((X @ w - y) ** 2)

    def train(tx):
        w = jnp.zeros((16,), jnp.float32)
        state = tx.init(w)
        for _ in range(200):
            g = jax.grad(loss_fn)(w)
            updates, state = tx.update(g, state, w)
            w = optax.apply_updates(w, updates)
        return float(loss_fn(w))

    l_fp32 = train(make_optimizer(1e-2))
    l_sr = train(make_optimizer(1e-2, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16))
    assert l_sr < l_fp32 * 1.15 + 1e-3, (l_sr, l_fp32)


def test_sr_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the low-memory AdamW state (bf16 leaves inside
    the ScaleByAdamSRState NamedTuple) — the trainer checkpoints opt_state
    (training/finetune.py save_checkpoint)."""
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
    state = tx.init(params)
    g = {"w": jnp.full((8, 8), 0.1, jnp.float32)}
    _, state = tx.update(g, state, params)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, {"opt_state": jax.device_get(state), "step": 1})
    template = jax.device_get(tx.init(params))
    restored = mgr.restore(1, {"opt_state": template, "step": 0})
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored["opt_state"])):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_save_matches_sync(tmp_path):
    """async_save=True (training.async_checkpointing): the write/rotate half
    runs on a background thread; contents must equal the sync path, saves
    stay ordered, rotation still applies, wait() surfaces write errors."""
    from unlearn_ft_tpu.training.checkpoint import CheckpointManager

    tree = {"w": np.arange(12, dtype=np.float32).reshape(3, 4), "step": 3}
    sync_mgr = CheckpointManager(str(tmp_path / "sync"))
    sync_mgr.save(3, tree, arch_vector=np.ones(4))
    amgr = CheckpointManager(str(tmp_path / "async"), total_limit=2,
                             async_save=True)
    for s in (1, 2):
        amgr.save(s, {"w": np.zeros((3, 4), np.float32), "step": s})
    amgr.save(3, tree, arch_vector=np.ones(4))
    amgr.wait()
    assert amgr.all_steps() == [2, 3]  # rotation ran on the writer thread
    template = {"w": np.zeros((3, 4), np.float32), "step": 0}
    a = amgr.restore(3, template)
    b = sync_mgr.restore(3, template)
    np.testing.assert_array_equal(a["w"], b["w"])
    assert int(a["step"]) == int(b["step"]) == 3
    np.testing.assert_array_equal(amgr.load_arch_vector(3),
                                  sync_mgr.load_arch_vector(3))
    # latest_step joins the in-flight write before scanning
    amgr.save(4, tree)
    assert amgr.latest_step() == 4

    # a failing write surfaces on the next wait(), not silently
    import orbax.checkpoint as ocp

    class Boom:
        def save(self, *a, **k):
            raise RuntimeError("disk full")

        def wait_until_finished(self):
            pass

    amgr.wait()
    amgr._ckptr = Boom()
    amgr.save(5, tree)
    with pytest.raises(RuntimeError, match="disk full"):
        amgr.wait()
    del ocp
