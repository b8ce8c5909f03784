"""Test configuration.

The suite runs on whatever JAX platform the environment provides (the real
TPU chip under axon, or CPU elsewhere) — numerics tolerances in the golden
tests hold on both. Multi-device mesh tests (tests/test_parallel.py) always
exercise a virtual 8-device CPU mesh via a subprocess with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``,
because the platform is fixed per-process at first jax import.
"""

import os

# Harmless on TPU; gives CPU runs 8 virtual devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

import jax  # noqa: E402


def pytest_collection_modifyitems(items):
    """Every test not explicitly marked ``slow`` is part of the fast tier,
    so ``pytest -m fast`` selects the quick unit suite."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)

# Persistent compilation cache: full-resolution model compiles dominate test
# time; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
