"""Test configuration: CPU backend with 8 virtual devices and float64.

Tests run on CPU (the TPU chip is reserved for benchmarks) with an 8-device
virtual mesh so every sharding path is exercised without real multi-chip
hardware, mirroring the multi-host test story SURVEY.md §4 calls for.
float64 is enabled so statistical tolerances match the double-precision
reference; library code itself is dtype-agnostic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-selected a remote TPU
# backend at interpreter startup (jax.config.update("jax_platforms",
# "axon,cpu")); undo that so tests run on the local CPU with the virtual
# 8-device mesh.
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() >= 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
