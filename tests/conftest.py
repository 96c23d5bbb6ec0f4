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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles thousands of CPU executables in one
    process; past ~225 tests the accumulation deterministically
    segfaults XLA's CPU backend_compile (reproduced twice at the same
    test; no subset of the suite reproduces it, RSS well under the
    host's memory). Dropping the jit caches at module teardown keeps
    the live-executable population bounded. Module-scoped fixtures
    recompile on demand, so this costs a little time, not correctness.
    """
    yield
    import jax
    jax.clear_caches()
