"""Test harness config: force the CPU backend with 8 virtual devices.

Must run before any jax computation.  The axon sitecustomize registers the
TPU plugin at interpreter start, so JAX_PLATFORMS in the environment is not
enough — we update jax.config in-process (the backend is initialized
lazily at first use, which is after collection starts).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.key(1127802)
