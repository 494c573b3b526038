import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.schedulers import (
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    flow_match_step,
    FlowMatchSchedule,
    pndm_init,
    pndm_step,
    pndm_timesteps,
)
from unlearn_ft_tpu.utils.snr import compute_snr, min_snr_weights


def _sched(pred="v_prediction"):
    return DiffusionSchedule(prediction_type=pred)


def test_add_noise_and_velocity_consistency():
    sched = _sched()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500])
    xt = sched.add_noise(x0, noise, t)
    v = sched.get_velocity(x0, noise, t)
    # recover x0 and eps from (xt, v): x0 = a*xt - s*v, eps = s*xt + a*v
    acp = sched.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    a, s = jnp.sqrt(acp), jnp.sqrt(1 - acp)
    np.testing.assert_allclose(a * xt - s * v, x0, atol=1e-5)
    np.testing.assert_allclose(s * xt + a * v, noise, atol=1e-5)


def test_to_x0_and_eps_invertibility():
    for pred in ("epsilon", "v_prediction"):
        sched = _sched(pred)
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        t = jnp.array([300])
        xt = sched.add_noise(x0, noise, t)
        target = sched.get_velocity(x0, noise, t) if pred == "v_prediction" else noise
        rec_x0, rec_eps = sched.to_x0_and_eps(target, xt, sched.alphas_cumprod[t])
        np.testing.assert_allclose(rec_x0, x0, atol=1e-4)
        np.testing.assert_allclose(rec_eps, noise, atol=1e-4)


def test_ddim_timesteps_leading():
    sched = _sched()
    ts = ddim_timesteps(sched, 50)
    assert len(ts) == 50
    assert ts[0] == 981 and ts[-1] == 1  # leading spacing + steps_offset 1
    assert (np.diff(ts) == -20).all()


def test_ddim_full_loop_recovers_x0():
    """With an oracle model that always reports the true trajectory, the DDIM
    loop from x_T must land on (a0*x0 + s0*eps) with final_alpha_cumprod."""
    sched = _sched("v_prediction")
    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    ts = ddim_timesteps(sched, 25)
    x = sched.add_noise(x0, eps, jnp.array([int(ts[0])]))
    for i, t in enumerate(ts):
        t_arr = jnp.array([int(t)])
        v = sched.get_velocity(x0, eps, t_arr)
        prev_t = jnp.array([int(ts[i + 1]) if i + 1 < len(ts) else int(t) - 40])
        x = ddim_step(sched, v, t_arr, prev_t, x)
    acp0 = sched.final_alpha_cumprod
    expected = jnp.sqrt(acp0) * x0 + jnp.sqrt(1 - acp0) * eps
    np.testing.assert_allclose(x, expected, atol=1e-3)


def test_pndm_constant_eps_trajectory():
    """With a constant-epsilon oracle, every multistep combination equals that
    epsilon, so PLMS must track the analytic trajectory exactly."""
    sched = _sched("epsilon")
    key = jax.random.PRNGKey(6)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
    n = 10
    ts = pndm_timesteps(sched, n)
    assert len(ts) == n + 1
    x = sched.add_noise(x0, eps, jnp.array([int(ts[0])]))
    state = pndm_init(x.shape)
    for t in ts:
        x, state = pndm_step(sched, state, eps, jnp.asarray(int(t)), x, n)
    acp0 = sched.final_alpha_cumprod
    expected = jnp.sqrt(acp0) * x0 + jnp.sqrt(1 - acp0) * eps
    np.testing.assert_allclose(x, expected, atol=2e-3)


def test_ddpm_step_terminal_no_noise():
    sched = _sched("epsilon")
    key = jax.random.PRNGKey(8)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(9), x0.shape)
    t = jnp.asarray(0)
    xt = sched.add_noise(x0, eps, t[None])
    out = ddpm_step(sched, jax.random.PRNGKey(10), eps, t, t - 1, xt)
    # at t=0, alpha_prod_prev=1 => posterior mean ~= x0 and no noise is added
    np.testing.assert_allclose(out, x0, atol=1e-3)


def test_flow_match():
    fm = FlowMatchSchedule(shift=3.0)
    assert fm.sigmas.shape == (1000,)
    sig = fm.inference_sigmas(4)
    assert len(sig) == 5 and sig[-1] == 0.0
    x = jnp.ones((1, 4))
    v = jnp.full((1, 4), 2.0)
    out = flow_match_step(x, v, jnp.asarray(0.5), jnp.asarray(0.25))
    np.testing.assert_allclose(out, 1.0 + (0.25 - 0.5) * 2.0)
    # scale_noise endpoint checks
    noise = jnp.zeros((1, 4))
    np.testing.assert_allclose(fm.scale_noise(x, noise, jnp.asarray([0.0])), x)
    np.testing.assert_allclose(fm.scale_noise(x, noise, jnp.asarray([1.0])), noise)


def test_snr_weights():
    sched = _sched()
    t = jnp.array([0, 100, 999])
    snr = compute_snr(sched.alphas_cumprod, t)
    assert snr[0] > snr[1] > snr[2]
    w_v = min_snr_weights(sched.alphas_cumprod, t, gamma=5.0, prediction_type="v_prediction")
    w_e = min_snr_weights(sched.alphas_cumprod, t, gamma=5.0, prediction_type="epsilon")
    np.testing.assert_allclose(w_v, jnp.minimum(snr + 1, 5.0) / (snr + 1), rtol=1e-6)
    np.testing.assert_allclose(w_e, jnp.minimum(snr, 5.0) / snr, rtol=1e-6)
