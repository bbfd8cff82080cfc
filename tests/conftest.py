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

#: Modules auto-marked ``slow`` (trainer e2e / multiprocess / serving /
#: CLI-driving suites — the wall-clock bulk of the full run). The fast
#: tier (``pytest -m "not slow"``) keeps every parity ORACLE — torch
#: golden tests for ops/models/losses, DTW/ETL/MFCC goldens, config,
#: data, sharding-equality units — and finishes in minutes; the full
#: suite is unchanged. Individual tests elsewhere can still opt in with
#: ``pytestmark = pytest.mark.slow``.
SLOW_TEST_MODULES = {
    "test_train_loop", "test_train_loop_tp", "test_train_loop_fsdp",
    "test_train_parity_e2e", "test_multidevice_trajectory",
    "test_encoder_training", "test_encoder_parallel",
    "test_encoder_device_corpus", "test_silent_train",
    "test_multiprocess", "test_multiprocess_axes", "test_multiprocess_ckpt",
    "test_launch", "test_serve", "test_evaluate", "test_export",
    "test_torch_export", "test_decode", "test_etl_scripts",
    "test_checkpoint", "test_device_corpus", "test_infer", "test_quant",
    "test_grad_accum", "test_remat", "test_fsdp", "test_moe",
    "test_mfcc_variant", "test_tp_checkpoint",
}


def pytest_collection_modifyitems(config, items):
    from pathlib import Path

    for item in items:
        module = Path(str(item.fspath)).stem
        if module in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
