"""Gumbel relaxations and straight-through estimators for pruning gates.

Functional JAX re-design of the reference's estimation utilities
(/root/reference/pdm/utils/estimation_utils.py:5-75). Instead of the
reference's implicit torch global RNG (with a fixed-seed torch.Generator in
eval mode), randomness is an explicit PRNG key: callers pass a fresh key in
training and a constant key (e.g. ``jax.random.PRNGKey(0)``) for the
reference's deterministic-eval behavior.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0,1) samples, matching -log(-log(U + eps) + eps)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + _EPS) + _EPS)


def hard_concrete(x: jax.Array) -> jax.Array:
    """Threshold at 0.5 with a straight-through gradient (identity backward).

    Mirrors reference estimation_utils.py:67-75.
    """
    hard = (x >= 0.5).astype(x.dtype)
    return x + jax.lax.stop_gradient(hard - x)


def gumbel_sigmoid_sample(
    key: jax.Array,
    logits: jax.Array,
    temperature: float,
    offset: float = 0.0,
    force_width_non_zero: bool = False,
) -> jax.Array:
    """Relaxed Bernoulli gates: sigmoid((logits + gumbel + offset)/T).

    With ``force_width_non_zero`` (reference estimation_utils.py:13-31), rows
    whose hard-thresholded sum is zero get +0.5 added to their first element
    so a width group can never be fully pruned. Vectorized (no data-dependent
    Python branches) so it stays jittable.
    """
    g = sample_gumbel(key, logits.shape, dtype=jnp.result_type(logits, jnp.float32))
    y = jax.nn.sigmoid((logits + g + offset) / temperature)
    if not force_width_non_zero:
        return y
    row_alive = hard_concrete(y).sum(axis=1) > 0
    bump = jnp.where(row_alive, 0.0, 0.5).astype(y.dtype)
    return y.at[:, 0].add(bump)


def importance_gumbel_softmax_sample(
    key: jax.Array,
    logits: jax.Array,
    temperature: float,
    offset: float = 0.0,
) -> jax.Array:
    """Importance-ordered depth gates (reference estimation_utils.py:49-64).

    softmax -> cumsum -> flip -> inverse-sigmoid -> gumbel-sigmoid. The flip
    of the cumulative mass makes earlier positions monotonically more likely
    to stay on, giving an ordered "how many blocks survive" relaxation.
    """
    x = jax.nn.softmax(logits, axis=1)
    x = jnp.cumsum(x, axis=1)
    x = jnp.flip(x, axis=1)
    eps = 1e-6
    x = jnp.log(x + eps) - jnp.log1p(-(x - eps))
    g = sample_gumbel(key, x.shape, dtype=x.dtype)
    return jax.nn.sigmoid((x + g + offset) / temperature)
