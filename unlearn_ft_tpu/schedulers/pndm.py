"""PNDM / PLMS sampling (skip_prk_steps=True path — what SD checkpoints and
the reference's FID generation use, scripts/metrics/generate_fid_images.py:113).

The reference relies on diffusers' stateful scheduler object; here the
linear-multistep state is an explicit, fixed-shape NamedTuple so the whole
sampling loop stays inside one jitted lax.fori_loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import DiffusionSchedule, _broadcast


class PNDMState(NamedTuple):
    ets: jnp.ndarray  # [4, *sample_shape] ring of past epsilon predictions
    num_ets: jnp.ndarray  # int32 scalar, capped at 4
    cur_sample: jnp.ndarray  # sample stashed at counter==0
    counter: jnp.ndarray  # int32 scalar


def pndm_timesteps(sched: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending PLMS timesteps; length num_inference_steps + 1 (the second
    entry is duplicated for the startup half-step)."""
    T = sched.num_train_timesteps
    step_ratio = T // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
    ts += sched.steps_offset
    plms = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
    return plms.copy()


def pndm_init(sample_shape, dtype=jnp.float32) -> PNDMState:
    return PNDMState(
        ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
        num_ets=jnp.asarray(0, jnp.int32),
        cur_sample=jnp.zeros(sample_shape, dtype),
        counter=jnp.asarray(0, jnp.int32),
    )


def _get_prev_sample(sched, sample, timestep, prev_timestep, model_output):
    acp = sched.alphas_cumprod
    alpha_t = acp[timestep]
    alpha_prev = jnp.where(
        prev_timestep >= 0, acp[jnp.clip(prev_timestep, 0)], sched.final_alpha_cumprod
    )
    beta_t = 1.0 - alpha_t
    beta_prev = 1.0 - alpha_prev
    if sched.prediction_type == "v_prediction":
        model_output = (
            _broadcast(jnp.sqrt(alpha_t), sample.ndim) * model_output
            + _broadcast(jnp.sqrt(beta_t), sample.ndim) * sample
        )
    elif sched.prediction_type != "epsilon":
        raise ValueError(f"PNDM supports epsilon/v_prediction, got {sched.prediction_type}")
    sample_coeff = jnp.sqrt(alpha_prev / alpha_t)
    denom = alpha_t * jnp.sqrt(beta_prev) + jnp.sqrt(alpha_t * beta_t * alpha_prev)
    return (
        _broadcast(sample_coeff, sample.ndim) * sample
        - _broadcast((alpha_prev - alpha_t) / denom, sample.ndim) * model_output
    )


def pndm_step(
    sched: DiffusionSchedule,
    state: PNDMState,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
):
    """One PLMS step. Returns (prev_sample, new_state)."""
    # scheduler math runs in the state dtype (fp32): a bf16 model output
    # would otherwise make the lax.switch branches disagree (branch 0 passes
    # it through raw; the multistep branches promote via the ets ring)
    model_output = model_output.astype(state.ets.dtype)
    step_ratio = sched.num_train_timesteps // num_inference_steps
    counter = state.counter
    is_second = counter == 1

    # update ets ring (skip on the startup half-step, counter==1)
    new_ets = jnp.concatenate([state.ets[1:], model_output[None]], axis=0)
    ets = jnp.where(is_second, state.ets, new_ets)
    num_ets = jnp.where(is_second, state.num_ets, jnp.minimum(state.num_ets + 1, 4))

    prev_timestep = jnp.where(is_second, timestep, timestep - step_ratio)
    eff_timestep = jnp.where(is_second, timestep + step_ratio, timestep)

    e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
    branch = jnp.where(
        counter == 0,
        0,
        jnp.where(is_second, 1, jnp.clip(num_ets, 2, 4)),
    )
    mo = jax.lax.switch(
        branch,
        [
            lambda: model_output,
            lambda: (model_output + e1) / 2.0,
            lambda: (3.0 * e1 - e2) / 2.0,
            lambda: (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0,
            lambda: (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0,
        ],
    )
    eff_sample = jnp.where(is_second, state.cur_sample, sample)
    cur_sample = jnp.where(counter == 0, sample, state.cur_sample)

    prev_sample = _get_prev_sample(sched, eff_sample, eff_timestep, prev_timestep, mo)
    return prev_sample, PNDMState(ets, num_ets, cur_sample, counter + 1)
