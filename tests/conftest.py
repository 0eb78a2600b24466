"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4: the TPU build must create its own
multi-host test story — the reference has none).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var at import time; the config
# update below is the reliable way to force the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA-CPU compiles are slow on this 1-core host; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_splat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
