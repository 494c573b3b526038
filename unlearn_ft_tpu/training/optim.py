"""Optimizer / LR-schedule factories (optax), matching the reference's
AdamW + diffusers get_scheduler options (pdm/utils/arg_utils.py,
trainer.py:405-450; configs use constant_with_warmup).
"""
from __future__ import annotations

from typing import Optional

import optax


def make_lr_schedule(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
):
    name = name.replace("-", "_")
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        if warmup_steps <= 0:  # diffusers semantics: no warmup => full LR at step 0
            return optax.constant_schedule(learning_rate)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    if name == "linear":
        assert total_steps is not None
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.linear_schedule(learning_rate, 0.0, total_steps - warmup_steps),
            ],
            [max(warmup_steps, 1)],
        )
    if name == "cosine":
        assert total_steps is not None
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, max(warmup_steps, 1), total_steps
        )
    raise ValueError(f"unknown lr scheduler {name}")


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    lr_scheduler: str = "constant_with_warmup",
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    max_grad_norm: Optional[float] = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """``mu_dtype=bfloat16`` halves the first-moment memory (optax's standard
    HBM knob) — the bilevel mix holds two AdamW states over ~500M params,
    which doesn't fit 16GB v5e HBM at fp32; nu stays fp32."""
    schedule = make_lr_schedule(lr_scheduler, learning_rate, warmup_steps, total_steps)
    tx = optax.adamw(
        schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay,
        mu_dtype=mu_dtype,
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
