"""Delta-weight publish/apply + shard consolidation (reference surface:
llava/model/apply_delta.py, make_delta.py, consolidate.py — used for
license-safe weight publishing)."""
from __future__ import annotations

import jax
import numpy as np


def make_delta(base_params, target_params):
    """delta = target - base (matching tree structures)."""
    return jax.tree.map(
        lambda t, b: (np.asarray(t, np.float32)
                      - np.asarray(b, np.float32)),
        target_params, base_params)


def apply_delta(base_params, delta):
    """target = base + delta, cast back to base dtypes."""
    return jax.tree.map(
        lambda b, d: (np.asarray(b, np.float32)
                      + np.asarray(d, np.float32)).astype(
            np.asarray(b).dtype),
        base_params, delta)


def consolidate(params):
    """Gather a (possibly sharded) param tree onto the host as numpy —
    single-file publishable form."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
