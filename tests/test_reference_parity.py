"""Golden parity tests against the reference implementation's pure-torch
modules, imported directly from /root/reference (read-only). Only modules
with no diffusers dependency can run here: estimation_utils and the losses.
"""
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/pdm"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_est():
    p = os.path.join(REF, "utils", "estimation_utils.py")
    if not os.path.exists(p):
        pytest.skip("reference not mounted")
    return _load(p, "ref_estimation")


def test_hard_concrete_parity(ref_est):
    import jax.numpy as jnp

    from unlearn_ft_tpu.utils.estimation import hard_concrete

    x = np.random.default_rng(0).uniform(0, 1, (4, 16)).astype(np.float32)
    want = ref_est.hard_concrete(torch.tensor(x)).numpy()
    got = np.asarray(hard_concrete(jnp.asarray(x)))
    np.testing.assert_allclose(got, want)


def test_importance_gumbel_deterministic_parity(ref_est, monkeypatch):
    """With the gumbel noise forced to zero in both implementations, the
    deterministic transform (softmax -> cumsum -> flip -> inverse sigmoid ->
    sigmoid((x+offset)/T)) must match exactly."""
    import jax
    import jax.numpy as jnp

    import unlearn_ft_tpu.utils.estimation as est

    x = np.random.default_rng(1).standard_normal((3, 7)).astype(np.float32)
    T, offset = 0.4, 2.0

    monkeypatch.setattr(
        ref_est, "sample_gumbel",
        lambda shape, eps=1e-20, fixed_seed=False: torch.zeros(shape),
    )
    want = ref_est.importance_gumbel_softmax_sample(
        torch.tensor(x), temperature=T, offset=offset
    ).numpy()

    monkeypatch.setattr(
        est, "sample_gumbel", lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    )
    got = np.asarray(
        est.importance_gumbel_softmax_sample(jax.random.PRNGKey(0), jnp.asarray(x), T, offset)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gumbel_sigmoid_deterministic_parity(ref_est, monkeypatch):
    import jax
    import jax.numpy as jnp

    import unlearn_ft_tpu.utils.estimation as est

    x = np.random.default_rng(2).standard_normal((3, 8)).astype(np.float32)
    monkeypatch.setattr(
        ref_est, "sample_gumbel",
        lambda shape, eps=1e-20, fixed_seed=False: torch.zeros(shape),
    )
    want = ref_est.gumbel_softmax_sample(
        torch.tensor(x), temperature=0.4, offset=2.0, force_width_non_zero=True
    ).numpy()

    monkeypatch.setattr(
        est, "sample_gumbel", lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    )
    got = np.asarray(
        est.gumbel_sigmoid_sample(
            jax.random.PRNGKey(0), jnp.asarray(x), 0.4, 2.0, force_width_non_zero=True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_contrastive_loss_parity():
    p = os.path.join(REF, "losses", "contrastive_loss.py")
    if not os.path.exists(p):
        pytest.skip("reference not mounted")
    ref = _load(p, "ref_contrastive")
    import jax.numpy as jnp

    from unlearn_ft_tpu.losses import contrastive_loss

    rng = np.random.default_rng(3)
    prompts = rng.standard_normal((6, 10)).astype(np.float32)
    archs = np.abs(rng.standard_normal((6, 12)).astype(np.float32))
    want = float(ref.ContrastiveLoss()(torch.tensor(prompts), torch.tensor(archs)))
    got, _ = contrastive_loss(jnp.asarray(prompts), jnp.asarray(archs))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_resource_loss_parity():
    p = os.path.join(REF, "losses", "resource_loss.py")
    if not os.path.exists(p):
        pytest.skip("reference not mounted")
    ref = _load(p, "ref_resource")
    import jax.numpy as jnp

    from unlearn_ft_tpu.losses import resource_loss

    for loss_type in ("log", "mae", "mse"):
        for ratio in (0.3, 0.5, 0.9):
            want = float(ref.ResourceLoss(p=0.5, loss_type=loss_type)(torch.tensor(ratio)))
            got = float(resource_loss(jnp.asarray(ratio), 0.5, loss_type))
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=f"{loss_type}@{ratio}")
