"""Pallas TPU flash attention (placeholder: XLA fallback).

Replaced by a fused Pallas kernel in the kernels milestone; the dispatch in
ops/attention.py only routes here on TPU for long self-attention sequences.
"""
from __future__ import annotations

import jax.numpy as jnp


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    from .attention import _xla_attention

    return _xla_attention(q, k, v, upcast=False)
