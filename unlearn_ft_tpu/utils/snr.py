"""Signal-to-noise-ratio utilities for min-SNR-gamma loss weighting.

Parity with the reference's compute_snr (pdm/utils/metric_utils.py) and the
min-SNR weighting applied in the trainers (pdm/training/trainer.py:2451-2470).
"""
from __future__ import annotations

import jax.numpy as jnp


def compute_snr(alphas_cumprod: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """SNR(t) = alpha_t^2 / sigma_t^2 with alpha=sqrt(acp), sigma=sqrt(1-acp)."""
    acp = alphas_cumprod[timesteps]
    return acp / (1.0 - acp)


def min_snr_weights(
    alphas_cumprod: jnp.ndarray,
    timesteps: jnp.ndarray,
    gamma: float,
    prediction_type: str = "v_prediction",
) -> jnp.ndarray:
    """Per-sample MSE weights, exactly as the reference computes them
    (pdm/training/trainer.py:2452-2470): for v-prediction SNR is first shifted
    by +1, then w = min(SNR, gamma)/SNR — i.e. min(snr+1, gamma)/(snr+1).
    """
    snr = compute_snr(alphas_cumprod, timesteps)
    if prediction_type == "v_prediction":
        snr = snr + 1.0
    elif prediction_type != "epsilon":
        raise ValueError(f"unknown prediction_type {prediction_type}")
    return jnp.minimum(snr, gamma) / snr
