"""Closed-loop learning proof: the full pipeline LEARNS.

Oracle trajectory generation (JPEGs + annotations.json on disk, the
reference's data format) -> VLN action dataset -> FSDP train step ->
teacher-forced action-token accuracy far above chance on the training
distribution. This exercises every training-side subsystem end to end
(data format round-trip, tokenization/label masking, splice layouts,
optimizer, mesh sharding) and asserts the result is actual learning,
not just finite losses.

Reference analogue: the SFT stage (streamvln/streamvln_train.py:1549)
trained on trajectories produced by
streamvln/streamvln_trajectory_generation.py; its only in-repo
validation is the benchmark itself, which needs habitat + checkpoints.
"""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def traj_root(tmp_path_factory):
    """Oracle trajectories from the fake env, via the real generator
    CLI (writes per-step JPEGs + annotations.json)."""
    from streamvln_tpu import trajectory_generation as tg
    root = str(tmp_path_factory.mktemp("closed_loop_traj"))
    tg.main([
        "--output_path", root, "--num_episodes", "2",
        "--env_backend", "fake", "--rgb_height", "48",
        "--rgb_width", "64", "--seed", "5",
    ])
    assert os.path.exists(os.path.join(root, "annotations.json"))
    return root


@pytest.mark.slow
def test_closed_loop_learning(traj_root, tmp_path):
    from streamvln_tpu import train as train_entry

    out = str(tmp_path / "run")
    state = train_entry.main([
        "--video_folders", traj_root,
        "--output_dir", out,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", "60", "--batch_size", "2",
        "--log_steps", "10", "--save_steps", "1000",
        "--dp", "1", "--fsdp", "2",
        "--learning_rate", "3e-3",
    ])
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    losses = [r["loss"] for r in log if "loss" in r]
    assert losses[-1] < 0.5 * losses[0], losses

    # teacher-forced action-token accuracy on the training windows:
    # argmax of the trained model on every supervised (unmasked) label
    # position. Chance on the 512-way byte vocab is ~0.2%; a model that
    # has learned the conversation scaffolding + expert actions clears
    # 80% easily, an unlearned one cannot.
    import jax
    import jax.numpy as jnp
    from streamvln_tpu import configs
    from streamvln_tpu.data.collate import collate
    from streamvln_tpu.data.tokenizer import load_tokenizer
    from streamvln_tpu.data.vln_dataset import VLNActionDataset
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.utils.constants import IGNORE_INDEX

    cfg = configs.StreamVLNConfig(
        vision=configs.tiny_vision(), llm=configs.tiny_llm(),
        num_frames=8, num_future_steps=2, num_history=2)
    tok = load_tokenizer(None, 32768)
    ds = VLNActionDataset(tok, cfg, [traj_root], seed=0)
    samples = [ds[i] for i in range(min(4, len(ds)))]
    batch = collate(samples, cfg, max_length=32768)
    layout = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("time_ids", "task_type")}
    images = layout.pop("images")

    params = jax.device_get(state.params)
    _, logits = streamvln.forward_train(params, cfg, images, layout)
    pred = np.asarray(jnp.argmax(logits[:, :-1], axis=-1))
    labels = np.asarray(layout["labels"])[:, 1:]
    valid = np.asarray(layout["valid"])[:, 1:]
    mask = (labels != IGNORE_INDEX) & valid
    assert mask.sum() > 50, int(mask.sum())
    acc = float((pred[mask] == labels[mask]).mean())
    assert acc > 0.8, f"action-token accuracy {acc:.3f} after overfit"
