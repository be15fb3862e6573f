"""Test configuration: run JAX on CPU with 8 virtual devices.

The container's sitecustomize pre-imports jax and registers the TPU backend,
so env vars alone are too late — we must flip the config before any backend
is initialized (conftest runs before tests touch devices).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
