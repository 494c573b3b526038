"""Training losses, as pure functions.

Parity targets:
- contrastive: pdm/losses/contrastive_loss.py:5-22 (BCE between softmaxed
  self-similarities of arch vectors vs prompt embeddings)
- resource: pdm/losses/resource_loss.py:5-23 (log/mae/mse around target p)
- diffusion (min-SNR) + distill + block distill: trainer.py:2451-2488
- ESD negative-guidance target: trainer.py:2994-2998
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.snr import min_snr_weights


def contrastive_loss(
    prompt_embeddings: jnp.ndarray,
    arch_vectors: jnp.ndarray,
    arch_temperature: float = 1.0,
    prompt_temperature: float = 1.0,
):
    """Aligns arch-space geometry with prompt-space geometry. Under jit with a
    batch sharded over the DP mesh, the [B, B] similarity is a global matmul —
    XLA inserts the all_gather the reference does manually
    (trainer.py:1214-1229)."""
    a = arch_vectors / jnp.linalg.norm(arch_vectors, axis=1, keepdims=True)
    p = prompt_embeddings / jnp.linalg.norm(prompt_embeddings, axis=1, keepdims=True)
    sim_a = jax.nn.softmax((a @ a.T) / arch_temperature, axis=-1)
    sim_p = jax.nn.softmax((p @ p.T) / prompt_temperature, axis=-1)
    sim_p = jax.lax.stop_gradient(sim_p)
    eps = 1e-12
    bce = -(sim_p * jnp.log(sim_a + eps) + (1.0 - sim_p) * jnp.log(1.0 - sim_a + eps))
    return bce.mean(), sim_a


def resource_loss(resource_ratio: jnp.ndarray, p: float, loss_type: str = "log") -> jnp.ndarray:
    if loss_type == "log":
        return jnp.abs(jnp.log(resource_ratio / p))
    if loss_type == "mae":
        return jnp.abs(resource_ratio - p)
    if loss_type == "mse":
        return (resource_ratio - p) ** 2
    raise ValueError(f"unknown loss type {loss_type}")


def diffusion_loss(
    model_pred: jnp.ndarray,
    target: jnp.ndarray,
    timesteps: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    snr_gamma: Optional[float],
    prediction_type: str,
) -> jnp.ndarray:
    err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if snr_gamma is None:
        return err.mean()
    w = min_snr_weights(alphas_cumprod, timesteps, snr_gamma, prediction_type)
    per_sample = err.reshape(err.shape[0], -1).mean(axis=1)
    return (per_sample * w).mean()


def distillation_loss(student_pred: jnp.ndarray, teacher_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        (student_pred.astype(jnp.float32) - jax.lax.stop_gradient(teacher_pred).astype(jnp.float32))
        ** 2
    )


def block_distillation_loss(
    student_acts: Dict[str, jnp.ndarray], teacher_acts: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    total = 0.0
    for k in student_acts:
        total = total + jnp.mean(
            (
                student_acts[k].astype(jnp.float32)
                - jax.lax.stop_gradient(teacher_acts[k]).astype(jnp.float32)
            )
            ** 2
        )
    return total / len(student_acts)


def esd_negative_guidance_target(
    teacher_cond: jnp.ndarray, teacher_uncond: jnp.ndarray, eta: float = 1.0
) -> jnp.ndarray:
    """upper target = uncond - eta*(cond - uncond) (trainer.py:2994-2998)."""
    return jax.lax.stop_gradient(teacher_uncond - eta * (teacher_cond - teacher_uncond))
