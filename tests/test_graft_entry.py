"""Driver entry points must stay green: single-chip compile check and
the 8-device multi-chip dry run (reference trains on 4x8 GPUs,
scripts/streamvln_train_slurm.sh:2-4,32-33 — the dryrun is our
equivalent artifact)."""
import pytest
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    loss, logits = jax.jit(fn)(*args)
    assert float(loss) > 0 and bool(jax.numpy.isfinite(loss))


@pytest.mark.slow
def test_dryrun_multichip_8():
    # conftest gives this process 8 virtual CPU devices, so this takes
    # the direct (no-subprocess) path; the subprocess fallback covers
    # the driver's axon-pinned environment.
    graft.dryrun_multichip(8)
