"""Test configuration: force a virtual 8-device CPU platform so that
multi-chip sharding paths compile and execute without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME does win.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
