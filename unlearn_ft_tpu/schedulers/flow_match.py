"""Flow-matching Euler schedule (Flux path; reference FluxPruner.get_sigmas,
pdm/training/trainer.py:1731-1741, and diffusers FlowMatchEulerDiscrete).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FlowMatchSchedule:
    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    sigmas: jnp.ndarray = field(default=None, repr=False)  # type: ignore[assignment]

    def __post_init__(self):
        if self.sigmas is None:
            s = np.linspace(1.0, 1.0 / self.num_train_timesteps, self.num_train_timesteps)
            if not self.use_dynamic_shifting:
                s = self.shift * s / (1.0 + (self.shift - 1.0) * s)
            object.__setattr__(self, "sigmas", jnp.asarray(s, jnp.float32))

    @property
    def timesteps(self) -> jnp.ndarray:
        return self.sigmas * self.num_train_timesteps

    def time_shift(self, mu: float, sigma: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(mu) / (jnp.exp(mu) + (1.0 / t - 1.0) ** sigma)

    def scale_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, sigmas: jnp.ndarray
    ) -> jnp.ndarray:
        """Forward process: x_t = (1 - sigma) x_0 + sigma * noise."""
        while sigmas.ndim < sample.ndim:
            sigmas = sigmas[..., None]
        return (1.0 - sigmas) * sample + sigmas * noise

    def inference_sigmas(self, num_inference_steps: int, mu: float = None) -> np.ndarray:
        s = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        if self.use_dynamic_shifting:
            assert mu is not None
            s = np.exp(mu) / (np.exp(mu) + (1.0 / s - 1.0))
        else:
            s = self.shift * s / (1.0 + (self.shift - 1.0) * s)
        return np.concatenate([s, [0.0]]).astype(np.float32)


def flow_match_step(
    sample: jnp.ndarray, model_output: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray
) -> jnp.ndarray:
    """Euler step: x_{next} = x + (sigma_next - sigma) * v."""
    d = sigma_next - sigma
    while jnp.ndim(d) < sample.ndim:
        d = d[..., None]
    return sample + d * model_output
