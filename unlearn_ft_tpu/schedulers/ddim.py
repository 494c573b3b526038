"""DDIM sampling step (deterministic eta=0 path used by the reference's
validation sampling; diffusers-DDIM semantics with leading spacing and
steps_offset, so checkpoints produce statistically identical trajectories).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import DiffusionSchedule, _broadcast


def ddim_timesteps(sched: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending timestep array (static, host-side)."""
    T = sched.num_train_timesteps
    if sched.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
        ts += sched.steps_offset
    elif sched.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
        return ts
    elif sched.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round().astype(np.int64)
    else:
        raise ValueError(f"unknown timestep_spacing {sched.timestep_spacing}")
    return ts[::-1].copy()


def ddim_step(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """x_t -> x_{t_prev} (eta = 0). ``prev_timestep`` may be negative, in
    which case final_alpha_cumprod is used (end of sampling)."""
    alpha_prod_t = sched.alphas_cumprod[timestep]
    alpha_prod_prev = jnp.where(
        prev_timestep >= 0,
        sched.alphas_cumprod[jnp.clip(prev_timestep, 0)],
        sched.final_alpha_cumprod,
    )
    x0, eps = sched.to_x0_and_eps(model_output, sample, alpha_prod_t)
    a_prev = _broadcast(jnp.sqrt(alpha_prod_prev), sample.ndim)
    s_prev = _broadcast(jnp.sqrt(1.0 - alpha_prod_prev), sample.ndim)
    return a_prev * x0 + s_prev * eps
