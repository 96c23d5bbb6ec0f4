"""CI-speed contract tests for the DAgger closed-loop protocol
(scripts/closed_loop_dagger.py; VERDICT r3 #1). The full measured run
lives in PARITY.md; these pin the encoding/gate contracts fast."""
import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import streamvln


@pytest.fixture(scope="module")
def random_params():
    return streamvln.init(jax.random.PRNGKey(1), tiny_streamvln())


def test_collection_encoding_and_gate(random_params, tmp_path):
    """Random (wandering) learner on bent far-goal episodes: the
    expert-corrected rollouts pass the save gate, and the saved
    annotations are trainable by VLNActionDataset (leading -1 action,
    1-based jpgs, frame count == action count)."""
    from closed_loop_dagger import collect_dagger
    out = str(tmp_path / "dagger")
    gate = collect_dagger(random_params, out, 3, seed=9,
                          data_iteration=1, max_steps=90)
    assert gate["attempted"] == 3
    assert gate["saved"] >= 1          # wandering inflates pl < 0.93
    anns = json.load(open(os.path.join(out, "annotations.json")))
    assert len(anns) == gate["saved"]
    for a in anns:
        assert a["actions"][0] == -1
        rgb = os.path.join(out, a["video"], "rgb")
        jpgs = sorted(os.listdir(rgb))
        assert jpgs[0] == "001.jpg"
        assert len(jpgs) == len(a["actions"])
        assert a["actions"][-1] in (0, 1, 2, 3)
    # the saved data loads through the production dataset
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.data.vln_dataset import VLNActionDataset
    ds = VLNActionDataset(ByteTokenizer(), tiny_streamvln(), [out])
    s = ds[0]
    assert (s["labels"] != -100).sum() > 0


def test_gate_rejects_near_optimal_paths(random_params, tmp_path):
    """On STRAIGHT paths even a wandering learner's rollouts stay at
    pl ~ 1 (turning adds steps, not meters) -> the gate rejects
    (reference semantics: DAgger data must come from rollouts
    measurably longer than optimal, streamvln_dagger.py:52-55,405)."""
    import closed_loop_dagger as cld
    from closed_loop_validation import far_episodes
    orig = cld.bent_episodes
    cld.bent_episodes = far_episodes       # force straight geometry
    try:
        out = str(tmp_path / "dagger0")
        gate = cld.collect_dagger(random_params, out, 2, seed=11,
                                  data_iteration=1, max_steps=90)
    finally:
        cld.bent_episodes = orig
    assert gate["saved"] == 0
