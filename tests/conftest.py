"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (mirrors the driver's dryrun)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize may pin JAX_PLATFORMS to the TPU tunnel; tests always run
# on the virtual 8-device CPU mesh, so override via config (beats the env).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: repeated test runs reuse XLA binaries across
# processes (the 1-core host makes cold compiles the dominant cost).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
