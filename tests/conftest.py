"""Test env: force CPU backend with 8 virtual devices BEFORE jax import.

This is the fake-backend analog the SURVEY §4c test plan calls for: all
sharding/collective logic runs on an 8-device CPU mesh in one process;
Pallas kernels run in interpreter mode (they auto-detect the CPU backend).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force, even if the env preselects TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax and registers the TPU plugin
# before conftest runs, so the env var alone is too late — override the
# already-captured config value as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
