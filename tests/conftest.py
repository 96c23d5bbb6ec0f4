"""Test environment: force CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

Note: this machine's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so plain env vars are clobbered — use jax.config instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
