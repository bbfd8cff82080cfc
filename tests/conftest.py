"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-device tests follow the standard fake-mesh trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8, JAX_PLATFORMS=cpu) so
the sharded train step is validated without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config route is authoritative and must run before any backend is touched.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: cuts repeat suite runs substantially.
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, "expected the 8-device virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
