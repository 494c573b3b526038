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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
