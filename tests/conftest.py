"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths (DP mesh, psum/all_gather collectives, distributed Sinkhorn) are
exercised without TPU hardware.

NOTE: the `axon` TPU platform plugin in this image ignores the JAX_PLATFORMS
environment variable, so the backend must be forced via jax.config (before
any computation). XLA_FLAGS still must be set before jax initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is XLA CPU compiles of tiny
# models repeated across runs (21m cold in round 1); warm runs skip them.
# XLA-level AOT caches are disabled — the jax-level executable cache is the
# win, and the CPU AOT loader logs spurious machine-feature warnings.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
