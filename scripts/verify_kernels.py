"""On-chip numerics check for the Pallas attention kernels.

Compares the splash/flash kernels against the fp32 XLA einsum reference at
the exact shapes the U-Net trains with (BLHD; 512px -> L=4096 H=5 D=64,
256px/mid -> L=1024 H=10, L=256 H=20 levels fall back to XLA), forward and
gradient. The CPU test suite can only exercise the Pallas interpreter
(tests/test_ops_attention.py); this script is the real-hardware counterpart
the bench numbers rest on.

Usage: python scripts/verify_kernels.py   (on a TPU host)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unlearn_ft_tpu.ops.attention import _xla_attention
from unlearn_ft_tpu.ops.flash_attention import flash_attention
from unlearn_ft_tpu.ops.splash_attention import splash_attention

# Both kernel and reference emit bf16, so agreement is bounded by bf16
# quantization: allow 2 ulps of the reference magnitude (2 * 2^-8), floored
# at one ulp at magnitude 1 for near-zero entries.
TOL = 2.0 * 2.0**-8


def _scaled_err(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.max(jnp.abs(a - b) / jnp.maximum(jnp.abs(b), 1.0)))


def check(name, fn, b, l, h, d, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q, k, v, w = (
        jnp.asarray(rng.standard_normal((b, l, h, d)), dtype) for _ in range(4)
    )

    def scalar(f):
        return lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32) * w.astype(jnp.float32))

    ref = lambda q, k, v: _xla_attention(q, k, v, upcast=True)  # noqa: E731
    out = jax.jit(fn)(q, k, v)
    want = jax.jit(ref)(q, k, v)
    ferr = _scaled_err(out, want)

    g = jax.jit(jax.grad(scalar(fn), argnums=(0, 1, 2)))(q, k, v)
    gw = jax.jit(jax.grad(scalar(ref), argnums=(0, 1, 2)))(q, k, v)
    gerr = max(_scaled_err(a, b_) for a, b_ in zip(g, gw))
    ok = ferr < TOL and gerr < TOL
    print(f"{'PASS' if ok else 'FAIL'} {name:6s} B{b} L{l:5d} H{h:2d} D{d}: "
          f"fwd scaled-maxerr {ferr:.2e}  grad scaled-maxerr {gerr:.2e}  "
          f"(tol {TOL:.1e} = 2 bf16 ulps)")
    return ok


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    if jax.default_backend() != "tpu":
        print("not a TPU backend — run this on the chip", file=sys.stderr)
        return 1
    ok = True
    # the two sequence lengths the 512px U-Net routes to splash
    ok &= check("splash", splash_attention, 8, 4096, 5, 64)
    ok &= check("splash", splash_attention, 8, 1024, 10, 64)
    ok &= check("splash", splash_attention, 8, 512, 10, 64)
    # the legacy flash fallback
    ok &= check("flash", flash_attention, 8, 4096, 5, 64)
    ok &= check("flash", flash_attention, 8, 1024, 10, 64)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
