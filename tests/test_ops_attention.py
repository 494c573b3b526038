"""Attention dispatch + kernel wrappers.

The Pallas kernels (splash/flash) only run on TPU; here the splash wrapper
is exercised through the Pallas interpreter at the smallest routed shape,
against the XLA reference the dispatch falls back to. On-chip numerics of
the real kernels are verified by scripts/verify_kernels.py (fwd and grad
within 2 bf16 ulps of the fp32-softmax XLA reference at L in
{512, 1024, 4096}).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unlearn_ft_tpu.ops.attention import _xla_attention, dot_product_attention


def _qkv(b=2, l=64, h=2, d=64, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.standard_normal((b, l, h, d)), dtype) for _ in range(3)
    )


def test_xla_attention_matches_naive_softmax():
    q, k, v = _qkv()
    out = _xla_attention(q, k, v, upcast=True)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_dispatch_uses_xla_path_off_tpu():
    # short/cross-attention shapes and CPU must route to the XLA path
    q, k, v = _qkv(l=64)
    out = dot_product_attention(q, k, v, upcast=True)
    want = _xla_attention(q, k, v, upcast=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_splash_interpret_matches_xla():
    from unlearn_ft_tpu.ops.splash_attention import splash_attention

    q, k, v = _qkv(b=1, l=512, h=1)
    out = splash_attention(q, k, v, interpret=True)
    want = _xla_attention(q, k, v, upcast=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-3)


def test_splash_interpret_gradients_match_xla():
    """The fused dq+dkv backward, through the Pallas interpreter, against
    jax.grad of the fp32 XLA reference."""
    from unlearn_ft_tpu.ops.splash_attention import splash_attention

    q, k, v = _qkv(b=1, l=512, h=1)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape), q.dtype)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * w)

    g = jax.grad(loss(lambda q, k, v: splash_attention(q, k, v, interpret=True)),
                 argnums=(0, 1, 2))(q, k, v)
    gw = jax.grad(loss(lambda q, k, v: _xla_attention(q, k, v, upcast=True)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
