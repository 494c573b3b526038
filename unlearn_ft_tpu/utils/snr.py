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
    """Per-sample MSE weights: min(SNR, gamma)/SNR (epsilon) or /(SNR+1) (v).

    Mirrors pdm/training/trainer.py:2451-2470 (which follows the min-SNR
    paper, arXiv 2303.09556, as implemented in diffusers' train scripts).
    """
    snr = compute_snr(alphas_cumprod, timesteps)
    clipped = jnp.minimum(snr, gamma)
    if prediction_type == "v_prediction":
        return clipped / (snr + 1.0)
    elif prediction_type == "epsilon":
        return clipped / snr
    else:
        raise ValueError(f"unknown prediction_type {prediction_type}")
