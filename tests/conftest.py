"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import anywhere in the test
process — hence a conftest at the tests root.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Persistent compilation cache: full-resolution model compiles dominate test
# time on CPU; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
