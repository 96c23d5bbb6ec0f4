"""Habitat registry extensions (guarded — habitat-sim is a host-side
dependency that exists only on simulator hosts; reference:
streamvln/habitat_extensions/measures.py).

Importing this package is always safe. Call `register_measures()` on a
habitat host before building an env so PathLength / OracleSuccess /
OracleNavigationError / OracleSPL / PL / StepsTaken / NDTW resolve from
`config.habitat.task.measurements` and show up in `env.get_metrics()`.
"""
from __future__ import annotations

_registered = False


def habitat_available() -> bool:
    try:
        import habitat  # noqa: F401
        return True
    except ImportError:
        return False


def register_measures():
    """Idempotently import + register the measure extensions into
    habitat's registry. Raises ImportError when habitat is absent."""
    global _registered
    from streamvln_tpu.habitat_extensions import measures
    if not _registered:
        measures.register_all()
        _registered = True
    return measures
