"""Shared diffusion-schedule math as pure functions over a static table.

TPU-native redesign of the scheduler objects the reference pulls from
diffusers (DDPM/DDIM/PNDM; used at pdm/training/trainer.py:2126,2409-2430 and
scripts/metrics/generate_fid_images.py:113): all tables are precomputed
jnp arrays; every op is shape-static and fuses into the jitted train/sample
step instead of living on the host.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> jnp.ndarray:
    if beta_schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
    if beta_schedule == "scaled_linear":
        return (
            jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        t = jnp.arange(num_train_timesteps, dtype=jnp.float32)
        f = lambda x: jnp.cos((x / num_train_timesteps + 0.008) / 1.008 * jnp.pi / 2) ** 2
        return jnp.minimum(1.0 - f(t + 1) / f(t), 0.999)
    raise ValueError(f"unknown beta_schedule {beta_schedule}")


def _broadcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@dataclass(frozen=True)
class DiffusionSchedule:
    """Static schedule tables + forward-process / parameterization math.

    Defaults match SD-2.1's scheduler config (scaled_linear 0.00085..0.012,
    1000 steps, v-prediction, steps_offset 1, set_alpha_to_one False).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "v_prediction"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    timestep_spacing: str = "leading"
    betas: jnp.ndarray = field(default=None, repr=False)  # type: ignore[assignment]
    alphas_cumprod: jnp.ndarray = field(default=None, repr=False)  # type: ignore[assignment]

    def __post_init__(self):
        if self.betas is None:
            betas = make_betas(
                self.num_train_timesteps, self.beta_start, self.beta_end, self.beta_schedule
            )
            object.__setattr__(self, "betas", betas)
        if self.alphas_cumprod is None:
            object.__setattr__(self, "alphas_cumprod", jnp.cumprod(1.0 - self.betas))

    @property
    def final_alpha_cumprod(self) -> jnp.ndarray:
        return (
            jnp.asarray(1.0, jnp.float32)
            if self.set_alpha_to_one
            else self.alphas_cumprod[0]
        )

    # ---- forward process -------------------------------------------------
    def add_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        acp = _broadcast(self.alphas_cumprod[timesteps], sample.ndim)
        return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        acp = _broadcast(self.alphas_cumprod[timesteps], sample.ndim)
        return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample

    def training_target(
        self, latents: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.get_velocity(latents, noise, timesteps)
        raise ValueError(f"unknown prediction_type {self.prediction_type}")

    # ---- parameterization conversions -------------------------------------
    def to_x0_and_eps(
        self, model_output: jnp.ndarray, sample: jnp.ndarray, alpha_prod_t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(pred_x0, pred_epsilon) from the model output at alpha_prod_t."""
        a = _broadcast(jnp.sqrt(alpha_prod_t), sample.ndim)
        s = _broadcast(jnp.sqrt(1.0 - alpha_prod_t), sample.ndim)
        if self.prediction_type == "epsilon":
            x0 = (sample - s * model_output) / a
            eps = model_output
        elif self.prediction_type == "v_prediction":
            x0 = a * sample - s * model_output
            eps = a * model_output + s * sample
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - a * x0) / s
        else:
            raise ValueError(f"unknown prediction_type {self.prediction_type}")
        return x0, eps

    def sample_timesteps(self, key: jax.Array, batch: int) -> jnp.ndarray:
        return jax.random.randint(key, (batch,), 0, self.num_train_timesteps)
