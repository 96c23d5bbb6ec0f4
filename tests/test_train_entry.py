"""End-to-end training CLI smoke test on the synthetic trajectory tree."""
import json
import os

import numpy as np
import pytest

from streamvln_tpu.data.vln_dataset import (
    write_annotations, write_trajectory)


@pytest.fixture(scope="module")
def traj_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traj"))
    rng = np.random.RandomState(0)
    entries = []
    for ep in range(3):
        n_act = 10
        frames = rng.randint(0, 255, (n_act, 48, 64, 3), np.uint8)
        entries.append(write_trajectory(
            root, f"scene_{ep}", frames, [f"instr {ep}"],
            rng.randint(0, 4, n_act).tolist()))
    write_annotations(root, entries)
    return root


def test_train_cli_runs_and_checkpoints(traj_root, tmp_path, monkeypatch):
    # If wandb is ever installed, keep it from attempting a networked
    # login; MetricsLogger passes WANDB_MODE through to wandb.init.
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from streamvln_tpu import train as train_entry
    out = str(tmp_path / "run")
    state = train_entry.main([
        "--video_folders", traj_root,
        "--output_dir", out,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", "3", "--batch_size", "2",
        "--log_steps", "1", "--save_steps", "2",
        "--dp", "1", "--fsdp", "2",
        "--learning_rate", "1e-3",
        "--export_hf",
        "--report_to", "wandb",     # degrades to JSONL mirror when
                                    # wandb is absent
    ])
    assert int(state.step) == 3
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    assert len(log) == 3
    assert all(np.isfinite(r["loss"]) for r in log)
    mirror = [json.loads(l) for l in
              open(os.path.join(out, "metrics.jsonl"))]
    assert [r["step"] for r in mirror] == [1, 2, 3]
    # checkpoints at step 2 and 3
    from streamvln_tpu.utils import checkpoint as ckpt
    assert ckpt.latest_step(os.path.join(out, "ckpt")) == 3
    assert os.path.exists(
        os.path.join(out, "hf_export", "model.safetensors"))


def test_train_cli_resumes(traj_root, tmp_path):
    from streamvln_tpu import train as train_entry
    out = str(tmp_path / "run2")
    common = [
        "--video_folders", traj_root, "--output_dir", out,
        "--model_size", "tiny", "--num_frames", "8",
        "--num_future_steps", "2", "--num_history", "2",
        "--batch_size", "2", "--log_steps", "1", "--save_steps", "100",
        "--dp", "1", "--fsdp", "2",
    ]
    train_entry.main(common + ["--num_steps", "2"])
    state = train_entry.main(common + ["--num_steps", "4"])
    assert int(state.step) == 4


def test_train_cli_mid_training_eval(traj_root, tmp_path):
    from streamvln_tpu import train as train_entry
    out = str(tmp_path / "run3")
    train_entry.main([
        "--video_folders", traj_root,
        "--output_dir", out,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", "2", "--batch_size", "2",
        "--log_steps", "1", "--save_steps", "10",
        "--eval_steps", "2", "--eval_episodes", "2",
        "--dp", "1", "--fsdp", "2",
        "--learning_rate", "1e-3",
    ])
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    ev = [r for r in log if any(k.startswith("eval/") for k in r)]
    assert len(ev) == 1
    keys = set(ev[0])
    assert "eval/sucs_all" in keys and "eval/spls_all" in keys


@pytest.mark.slow
def test_train_cli_lora_int8(traj_root, tmp_path):
    from streamvln_tpu import train as train_entry
    out = str(tmp_path / "run4")
    state = train_entry.main([
        "--video_folders", traj_root,
        "--output_dir", out,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", "2", "--batch_size", "2",
        "--log_steps", "1", "--save_steps", "10",
        "--lora_enable", "--lora_r", "4", "--bits", "8",
        "--act_int8", "--export_hf",
        "--dp", "1", "--fsdp", "2",
        "--learning_rate", "1e-3",
    ])
    import jax.numpy as jnp
    layers = state.params["llm"]["layers"]
    assert layers["q_w"].dtype == jnp.int8         # base stays int8
    assert "q_w_lora_a" in layers                  # adapters present
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    assert all(np.isfinite(r["loss"]) for r in log if "loss" in r)
    # adapter-only artifact + merged (dequantized) HF export
    ad = np.load(os.path.join(out, "lora_adapters.npz"))
    assert any(k.endswith("_lora_a") for k in ad.files)
    assert os.path.exists(
        os.path.join(out, "hf_export", "model.safetensors"))
