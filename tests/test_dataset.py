"""VLN dataset + collator tests over a synthetic trajectory tree."""
import json
import os

import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.collate import (
    CombineDataset, TaskGroupedBatchSampler, collate)
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.data.vln_dataset import (
    VLNActionDataset, write_annotations, write_trajectory)
from streamvln_tpu.utils.constants import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX)


@pytest.fixture(scope="module")
def traj_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traj"))
    rng = np.random.RandomState(0)
    entries = []
    # episode 0: 12 actions -> with tiny cfg (nf=8) gives 2 windows
    for ep, n_act in [(0, 12), (1, 5)]:
        frames = rng.randint(0, 255, (n_act, 48, 64, 3), np.uint8)
        entries.append(write_trajectory(
            root, f"scene_a_{ep}", frames,
            [f"instruction {ep}", f"alt instruction {ep}"],
            rng.randint(0, 4, n_act).tolist()))
    write_annotations(root, entries)
    return root


def test_window_splitting(traj_root):
    cfg = tiny_streamvln()   # num_frames=8, num_future_steps=2
    ds = VLNActionDataset(ByteTokenizer(), cfg, [traj_root])
    # ep0: 12 actions -> windows at 0 and 8, x2 instructions = 4
    # ep1: 5 actions -> window at 0, x2 instructions = 2
    assert len(ds) == 6


def test_first_window_sample(traj_root):
    cfg = tiny_streamvln()
    ds = VLNActionDataset(ByteTokenizer(), cfg, [traj_root])
    s = ds[0]
    ids = s["input_ids"]
    # first window: no memory token, nf/nfs = 4 images
    assert (ids == MEMORY_TOKEN_INDEX).sum() == 0
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 4
    assert len(s["images"]) == 4
    assert s["images"].shape[1:] == (cfg.vision.image_size,
                                     cfg.vision.image_size, 3)
    # labels: assistant turns unmasked; decoded labels contain glyphs
    lab = s["labels"]
    assert (lab != IGNORE_INDEX).sum() > 0
    assert s["time_ids"].tolist() == list(range(8))


def test_second_window_has_memory_and_history(traj_root):
    cfg = tiny_streamvln()
    ds = VLNActionDataset(ByteTokenizer(), cfg, [traj_root])
    # find a start_idx=8 sample
    idx = next(i for i, (e, ins, st, v) in enumerate(ds.data_list)
               if st == 8)
    s = ds[idx]
    assert (s["input_ids"] == MEMORY_TOKEN_INDEX).sum() == 1
    # history: arange(0, 8, max(8//2,1)=4) -> 2 frames; window has 12-8=4
    # actions -> 2 sample frames
    assert len(s["images"]) == 2 + 2
    assert s["time_ids"].tolist() == [8, 9, 10, 11]


def test_actions_shifted_with_stop(traj_root):
    """Teacher actions are the NEXT actions (shifted by 1, STOP last)."""
    cfg = tiny_streamvln()
    tok = ByteTokenizer()
    ds = VLNActionDataset(tok, cfg, [traj_root])
    ep_id, ins_id, start, valid = ds.data_list[0]
    raw_actions = ds.nav_data[ep_id]["actions"]
    s = ds[0]
    # decode assistant turns from labels
    lab = s["labels"]
    text = tok.decode([t for t in lab.tolist() if t >= 0])
    glyphs = chatml.parse_actions(text)
    expect = (list(raw_actions[1:]) + [0])[:8]
    assert glyphs == expect[: len(glyphs)]
    assert len(glyphs) == len(expect)


def test_collate_shapes(traj_root):
    cfg = tiny_streamvln()
    ds = VLNActionDataset(ByteTokenizer(), cfg, [traj_root])
    batch = collate([ds[0], ds[1]], cfg, length_buckets=(2048, 4096))
    B, T = batch["token_ids"].shape
    assert B == 2 and T in (2048, 4096)
    assert batch["images"].shape[0] == 2
    assert batch["valid"].dtype == bool
    assert (batch["vision_index"][batch["is_vision"]] <
            batch["images"].shape[1] * cfg.tokens_per_frame).all()


def test_task_grouped_sampler():
    tasks = [0] * 10 + [1] * 7 + [2] * 4
    sampler = TaskGroupedBatchSampler(tasks, batch_size=4, seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler)
    tasks = np.asarray(tasks)
    for b in batches:
        assert len(set(tasks[b])) == 1   # one task per batch
        assert len(b) == 4


def test_combine_dataset(traj_root):
    cfg = tiny_streamvln()

    class Dummy:
        task_id = 3
        def __len__(self): return 2
        def __getitem__(self, i): return {"task_id": 3, "i": i}

    ds = VLNActionDataset(ByteTokenizer(), cfg, [traj_root])
    comb = CombineDataset([ds, Dummy()])
    assert len(comb) == len(ds) + 2
    assert comb[len(ds) + 1] == {"task_id": 3, "i": 1}
    assert (comb.task_ids[: len(ds)] == 0).all()
    assert (comb.task_ids[len(ds):] == 3).all()
