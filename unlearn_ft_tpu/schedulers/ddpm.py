"""Ancestral DDPM sampling step (stochastic; fixed_small variance)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import DiffusionSchedule, _broadcast


def ddpm_step(
    sched: DiffusionSchedule,
    key: jax.Array,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    clip_sample: bool = False,
) -> jnp.ndarray:
    alpha_prod_t = sched.alphas_cumprod[timestep]
    alpha_prod_prev = jnp.where(
        prev_timestep >= 0,
        sched.alphas_cumprod[jnp.clip(prev_timestep, 0)],
        jnp.asarray(1.0, jnp.float32),
    )
    beta_prod_t = 1.0 - alpha_prod_t
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t

    x0, _ = sched.to_x0_and_eps(model_output, sample, alpha_prod_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
    coef_xt = jnp.sqrt(current_alpha_t) * (1.0 - alpha_prod_prev) / beta_prod_t
    mean = _broadcast(coef_x0, sample.ndim) * x0 + _broadcast(coef_xt, sample.ndim) * sample

    variance = (1.0 - alpha_prod_prev) / beta_prod_t * current_beta_t
    variance = jnp.clip(variance, 1e-20)
    noise = jax.random.normal(key, sample.shape, sample.dtype)
    has_noise = (timestep > 0).astype(sample.dtype)
    return mean + has_noise * _broadcast(jnp.sqrt(variance), sample.ndim) * noise
