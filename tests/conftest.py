"""Test harness: force an 8-device virtual CPU platform so sharding paths are
exercised without TPU hardware.

The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so we
must force the platform through jax.config *before any backend is initialized*
(conftest imports run before test modules import jax-dependent code).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
