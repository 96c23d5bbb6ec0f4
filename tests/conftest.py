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
# Persistent compilation cache: the per-module jit-cache clear below
# (segfault pin) forces recompiles of the shared tiny-model programs;
# persisting them turns those recompiles into disk loads across
# modules AND runs. Same-machine cache only (tests/.jax_cache_cpu).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the opt-in slow lane)")


def pytest_collection_modifyitems(config, items):
    """Two-lane suite (CLAUDE.md: default `pytest tests/ -q` stays
    under ~10 min). Tests marked `slow` — the long parity lockstep
    runs, 32k-context training, multi-process rendezvous, closed-loop
    learning — skip by default; run them with --runslow or RUN_SLOW=1.
    CI for a release should run BOTH lanes."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow lane: pass --runslow or set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
