"""Test configuration: force an 8-virtual-device CPU platform.

Must run before jax initializes — pytest imports conftest before test
modules, and no package module imports jax at import time of conftest.
"""

import os

# Simulate an 8-chip mesh on CPU so sharding tests exercise real
# collectives without TPU hardware (SURVEY.md §4 implication). Force cpu
# even if the ambient environment selects a TPU platform; opt back into
# device tests with RFI_TEST_TPU=1.
if not os.environ.get("RFI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must be hermetic: the CLI entry points call configure_platform,
# which would otherwise switch the REST of the suite onto the shared
# on-disk compilation cache (~/.cache/rfi_jax_cache) — concurrently
# written by bench/training processes, and a torn/corrupt entry
# SEGFAULTS jax's cache deserializer mid-suite (observed 2026-08-19:
# rc=139 in compilation_cache.get_executable_and_time). "" is
# configure_platform's documented opt-out.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

if not os.environ.get("RFI_TEST_TPU"):
    # The environment's sitecustomize imports jax at interpreter startup
    # (registering a TPU PJRT plugin and freezing JAX_PLATFORMS from the
    # ambient env), so setting the env var here is too late — update the
    # live config before any backend is instantiated.
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Config-level kill switch for the persistent compile cache, on top
    # of the env opt-out above: is_persistent_cache_enabled() requires
    # this flag, so no configure_platform()/enable_compilation_cache()
    # call inside a test can re-attach the suite to the shared on-disk
    # cache (which bench/training processes write concurrently).
    jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
