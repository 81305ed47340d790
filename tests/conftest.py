"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS to the TPU plugin at interpreter start,
so the env-var route is latched before pytest runs; jax.config.update is the
reliable override.  XLA_FLAGS must still be set before the CPU backend is
instantiated to get 8 virtual devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
