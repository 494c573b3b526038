"""Optimizer / LR-schedule factories (optax), matching the reference's
AdamW + diffusers get_scheduler options (pdm/utils/arg_utils.py,
trainer.py:405-450; configs use constant_with_warmup).

Adds a low-memory AdamW variant with bf16 moments + stochastic rounding:
on 16GB-v5e chips the bilevel mix carries TWO moment sets over the ~500M
param student, and fp32 moments cap the per-chip batch at 8. Deterministic
bf16 second moments would freeze (the (1-b2)=1e-3 increments fall below
bf16's 2^-8 resolution), so stores are stochastically rounded — unbiased
accumulation, the standard trick for low-precision optimizer state on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
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


def _hash_bits(seed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-element uniform uint32 stream from a murmur3-style finalizer over
    (seed, element index). Cheap vector ops only — one threefry instance per
    param leaf (686 leaves for the SD U-Net) SIGKILLs the XLA compiler, and
    hardware stochastic rounding uses exactly this class of generator."""
    x = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _stochastic_round(x: jnp.ndarray, dtype, seed) -> jnp.ndarray:
    """Unbiased fp32 -> bf16 rounding: add a uniform 16-bit value below the
    truncation point, then truncate. Monotonic float bit patterns within a
    sign make the mantissa carry propagate correctly into the exponent."""
    if dtype is None or x.dtype == dtype:
        return x
    assert dtype == jnp.bfloat16, "stochastic rounding implemented for bf16 only"
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = _hash_bits(seed, x.size).reshape(x.shape) & jnp.uint32(0xFFFF)
    return jax.lax.bitcast_convert_type(
        (bits + r) & jnp.uint32(0xFFFF0000), jnp.float32
    ).astype(jnp.bfloat16)


class ScaleByAdamSRState(NamedTuple):
    count: chex.Array
    mu: chex.ArrayTree
    nu: chex.ArrayTree


def scale_by_adam_low_mem(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
    nu_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with both moments stored in bf16 via stochastic
    rounding (update math in fp32). With fp32 dtypes it is bitwise
    optax.scale_by_adam (tested)."""

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return ScaleByAdamSRState(jnp.zeros([], jnp.int32), mu, nu)

    def update(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        leaves, treedef = jax.tree.flatten(updates)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        # Leaves are processed in an optimization_barrier chain so XLA cannot
        # schedule every leaf's fp32 moment temporaries concurrently — without
        # it the update's transient HBM is ~3 fp32 copies of the WHOLE param
        # tree (+6GB at 508M params), which is what OOMed the bilevel step at
        # batch 12/16. The token returned by each barrier depends on the
        # leaf's outputs; feeding it into the next leaf serializes them.
        token = jnp.zeros((), jnp.float32)
        out, mu_s, nu_s = [], [], []
        for i, (g, m0, n0) in enumerate(
            zip(leaves, jax.tree.leaves(state.mu), jax.tree.leaves(state.nu))
        ):
            g32 = g.astype(jnp.float32) + token  # token==0: pure dependency
            m = b1 * m0.astype(jnp.float32) + (1 - b1) * g32
            n = b2 * n0.astype(jnp.float32) + (1 - b2) * (g32 * g32)
            o = (m / bc1) / (jnp.sqrt(n / bc2) + eps)
            seed = count.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            ms = _stochastic_round(m, mu_dtype, seed + jnp.uint32(2 * i + 1))
            ns = _stochastic_round(n, nu_dtype, seed + jnp.uint32(2 * i + 2))
            o, ms, ns, token = jax.lax.optimization_barrier((o, ms, ns, token))
            out.append(o)
            mu_s.append(ms)
            nu_s.append(ns)
        new_state = ScaleByAdamSRState(
            count,
            jax.tree.unflatten(treedef, mu_s),
            jax.tree.unflatten(treedef, nu_s),
        )
        return jax.tree.unflatten(treedef, out), new_state

    return optax.GradientTransformation(init, update)


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
    nu_dtype=None,
) -> optax.GradientTransformation:
    """``mu_dtype=bfloat16`` halves the first-moment memory (optax's standard
    HBM knob; deterministic rounding is fine for the (1-b1)=0.1 increments).
    ``nu_dtype=bfloat16`` additionally halves the second moment via the
    stochastic-rounding AdamW (scale_by_adam_low_mem) — together they halve
    total optimizer-state HBM, which is what lets the two-state bilevel mix
    run batch 16 on a 16GB v5e chip."""
    schedule = make_lr_schedule(lr_scheduler, learning_rate, warmup_steps, total_steps)
    if nu_dtype is not None:
        tx = optax.chain(
            scale_by_adam_low_mem(
                b1=beta1, b2=beta2, eps=eps,
                mu_dtype=mu_dtype or jnp.float32, nu_dtype=nu_dtype,
            ),
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        tx = optax.adamw(
            schedule, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
