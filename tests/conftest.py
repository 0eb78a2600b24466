"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4: the TPU build must create its own
multi-host test story — the reference has none).

Hardware lane: `TPU_SPLAT_TEST_TPU=1 python -m pytest tests -m tpu` keeps the real
backend and runs only the @pytest.mark.tpu tests (kernel parity + shard_map smoke on
the chip). Without the env var, everything runs on the CPU mesh and tpu-marked tests
are skipped.
"""

import os

TPU_LANE = os.environ.get("TPU_SPLAT_TEST_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_LANE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not TPU_LANE:
    # NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var at import time; the
    # config update below is the reliable way to force the CPU backend for tests.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA-CPU compiles are slow on this 1-core host; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_splat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs real TPU hardware (see conftest)")


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        skip = pytest.mark.skip(reason="TPU lane runs only @pytest.mark.tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs TPU hardware (set TPU_SPLAT_TEST_TPU=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
