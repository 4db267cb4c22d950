"""Test harness config: run everything on a virtual 8-device CPU mesh.

Per the build brief, sharding is validated on host CPU devices; the real-TPU
path is exercised by bench.py and the driver's compile checks.

NOTE: this environment's sitecustomize imports jax and registers the axon
TPU backend before conftest runs, so env vars alone are too late —
``jax.config.update`` is the reliable switch.
"""

import os

# XLA reads this lazily at first backend init, which hasn't happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
