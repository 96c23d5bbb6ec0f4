"""Turnkey real-checkpoint harness (VERDICT r4 #8).

The documented one-command path — a weights directory + a habitat
dataset config in, `result.json` with resume out:

    python -m streamvln_tpu.eval_cli --model_path <weights_dir> \
        --env_backend habitat --habitat_config_path config/vln_r2r.yaml \
        --eval_split val_unseen --output_path <out>

verified END-TO-END against the in-tree habitat stub: an HF-format
checkpoint (safetensors + tokenizer files, as the published StreamVLN
weights ship) is converted at load, the habitat backend constructs
through the real adapter (config inject + measure registration), the
evaluator walks every episode, writes result.json, and a SECOND
invocation resumes (re-runs nothing). The day real weights/habitat-sim
appear this exact command runs unmodified — only the stub swaps out.
Reference command: scripts/streamvln_eval_multi_gpu.sh ->
streamvln/streamvln_eval.py:489-581.
"""
import json
import os
import shutil
import sys

import numpy as np
import pytest

import habitat_stub


@pytest.fixture()
def habitat_env():
    mods, _registry = habitat_stub.install()
    for m in ("streamvln_tpu.habitat_extensions.measures",
              "streamvln_tpu.habitat_extensions",
              "streamvln_tpu.eval.habitat_backend"):
        sys.modules.pop(m, None)
    yield
    habitat_stub.uninstall(mods)
    for m in ("streamvln_tpu.habitat_extensions.measures",
              "streamvln_tpu.habitat_extensions",
              "streamvln_tpu.eval.habitat_backend"):
        sys.modules.pop(m, None)


@pytest.fixture()
def hf_checkpoint(tmp_path):
    """A weights dir exactly as the published checkpoint ships:
    HF-format safetensors + tokenizer files."""
    import jax

    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.utils.checkpoint import save_hf

    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "weights"
    save_hf(params, cfg, str(ckpt))
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures", "bpe_tokenizer")
    for f in os.listdir(fixture):
        shutil.copy(os.path.join(fixture, f), ckpt / f)
    return str(ckpt)


def test_turnkey_command_end_to_end(habitat_env, hf_checkpoint,
                                    tmp_path):
    from streamvln_tpu import eval_cli

    out = str(tmp_path / "results")
    argv = [
        "--model_path", hf_checkpoint,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--env_backend", "habitat",
        "--habitat_config_path", "config/vln_r2r.yaml",
        "--eval_split", "val_unseen",
        "--output_path", out,
        "--max_steps_per_episode", "12",
    ]
    final = eval_cli.main(argv)

    # the stub env carries 4 episodes; every one must be recorded
    # (result.json = one line per episode + the appended aggregate)
    result_file = os.path.join(out, "result.json")
    assert os.path.exists(result_file)

    def episode_recs():
        recs = [json.loads(ln) for ln in
                open(result_file).read().splitlines() if ln.strip()]
        return [r for r in recs if "episode_id" in r]

    recs = episode_recs()
    assert len(recs) == 4, recs
    assert {r["episode_id"] for r in recs} == {"0", "1", "2", "3"}
    assert final["length"] == 4
    for key in ("sucs_all", "spls_all", "oss_all", "ones_all"):
        assert np.isfinite(final[key]), (key, final)

    # resume: the second invocation of the SAME command re-runs nothing
    # and aggregates the recorded episodes
    final2 = eval_cli.main(argv)
    recs2 = episode_recs()
    assert recs2 == recs
    assert final2["length"] == 4
    assert final2["sucs_all"] == final["sucs_all"]


def test_turnkey_command_resumes_partial(habitat_env, hf_checkpoint,
                                         tmp_path):
    """A partially-written result.json (killed mid-run) resumes from
    where it stopped: only the missing episodes run."""
    from streamvln_tpu import eval_cli

    out = str(tmp_path / "results")
    argv = [
        "--model_path", hf_checkpoint,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--env_backend", "habitat",
        "--habitat_config_path", "config/vln_r2r.yaml",
        "--output_path", out,
        "--max_steps_per_episode", "12",
    ]
    final = eval_cli.main(argv)
    result_file = os.path.join(out, "result.json")
    ep_lines = [ln for ln in open(result_file).read().splitlines()
                if ln.strip() and "episode_id" in json.loads(ln)]
    # keep only the first two episodes, as a killed run would
    with open(result_file, "w") as f:
        f.write("\n".join(ep_lines[:2]) + "\n")
    final2 = eval_cli.main(argv)
    ep_lines2 = [ln for ln in open(result_file).read().splitlines()
                 if ln.strip() and "episode_id" in json.loads(ln)]
    assert len(ep_lines2) == 4
    assert ep_lines2[:2] == ep_lines[:2]
    assert final2["length"] == 4
    assert final2["sucs_all"] == final["sucs_all"]
