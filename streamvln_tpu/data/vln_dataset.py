"""VLN action-trajectory dataset: 32-step windows of expert episodes.

Data format parity (reference: streamvln/dataset/vln_action_dataset.py and
the oracle generator streamvln_trajectory_generation.py:118-137):
- trajectory folder: `<video>/rgb/NNN.jpg` frames + an `annotations.json`
  listing `{id, video, instructions[], actions[]}` per episode
- sample = one `num_frames`-step window: actions shifted by one with STOP
  appended (`actions[1+valid:] + [0]`, vln_action_dataset.py:743), one
  conversation round per `num_future_steps` actions (round = human turn
  '<conjunction> <image>.' / gpt turn arrow-text of the round's actions,
  :713-731); windows after the first get the history clause + <memory>
  (:772-773) and history frames sampled at
  arange(valid, t0+valid, max(t0 // num_history, 1)) (:753-757)
- first round's human turn carries the full task prompt with the episode
  instruction (:691, :775)

Output per sample: dict(input_ids, labels, images [V, S, S, 3] float32
preprocessed pixels, time_ids, task_id) — ready for the collator.
"""
from __future__ import annotations

import json
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import Tokenizer
from streamvln_tpu.ops.preprocess import preprocess_frames_host
from streamvln_tpu.utils.constants import (
    DEFAULT_MEMORY_TOKEN, NAV_PROMPT)


class VLNActionDataset:
    task_id = 0

    def __init__(self, tokenizer: Tokenizer, cfg: StreamVLNConfig,
                 video_folders: Sequence[str],
                 transform: Optional[Callable] = None,
                 remove_init_turns: bool = False,
                 image_size: Optional[int] = None,
                 seed: int = 0):
        self.tok = tokenizer
        self.cfg = cfg
        self.transform = transform
        self.image_size = image_size or cfg.vision.image_size
        self.rng = np.random.default_rng(seed)

        self.nav_data = []
        for vf in video_folders:
            with open(os.path.join(vf, "annotations.json")) as f:
                anno = json.load(f)
            for item in anno:
                item = dict(item)
                item["video"] = os.path.join(vf, item["video"])
                self.nav_data.append(item)

        nf = cfg.num_frames
        self.data_list = []
        for ep_id, item in enumerate(self.nav_data):
            actions = item["actions"]
            if len(actions) < 4:
                continue
            instructions = item["instructions"]
            if not isinstance(instructions, list):
                instructions = [instructions]
            for ins_id in range(len(instructions)):
                valid_idx = 0
                if remove_init_turns:
                    valid_idx = self._count_init_turns(actions)
                if len(actions) - valid_idx < 4:
                    continue
                num_rounds = (len(actions) - valid_idx) // nf
                for n in range(num_rounds + 1):
                    if n * nf == len(actions) - valid_idx:
                        continue
                    self.data_list.append((ep_id, ins_id, n * nf,
                                           valid_idx))

    @staticmethod
    def _count_init_turns(actions: Sequence[int]) -> int:
        """Skip leading pure-rotation prefix (remove_init_turns)."""
        i = 0
        while i < len(actions) and actions[i] in (2, 3):
            i += 1
        return i if i < len(actions) else 0

    def __len__(self):
        return len(self.data_list)

    @property
    def task(self):
        return self.task_id

    def __getitem__(self, i: int) -> dict:
        ep_id, ins_id, start_idx, valid_idx = self.data_list[i]
        data = self.nav_data[ep_id]
        video_path = data["video"]
        frames = sorted(os.listdir(os.path.join(video_path, "rgb")))

        instructions = data["instructions"]
        if not isinstance(instructions, list):
            instructions = [instructions]

        nf, nfs, nh = (self.cfg.num_frames, self.cfg.num_future_steps,
                       self.cfg.num_history)
        actions = list(data["actions"][1 + valid_idx:]) + [0]
        time_ids = np.arange(start_idx, min(start_idx + nf, len(actions)))
        assert len(time_ids) > 0
        win_actions = np.asarray(actions)[time_ids]

        s, e = time_ids[0] + valid_idx, time_ids[-1] + 1 + valid_idx
        sample_ids = np.arange(s, e, nfs, dtype=np.int64)
        sample_frames = [os.path.join(video_path, "rgb", frames[j])
                         for j in sample_ids]
        if time_ids[0] != 0:
            hist_ids = np.arange(valid_idx, time_ids[0] + valid_idx,
                                 max(time_ids[0] // nh, 1))
            history_frames = [os.path.join(video_path, "rgb", frames[j])
                              for j in hist_ids]
        else:
            history_frames = []

        images = self._load_images(history_frames + sample_frames)

        # conversation
        base = NAV_PROMPT.replace("<instruction>.", instructions[ins_id])
        if start_idx != 0:
            base += (" These are your historical observations: "
                     f"{DEFAULT_MEMORY_TOKEN}.")
        turns = []
        j = 0
        first = True
        while j < len(win_actions):
            step_actions = win_actions[j: j + nfs]
            user = chatml.observation_prompt(self.rng,
                                             base if first else "")
            turns.append(("user", user))
            turns.append(("assistant",
                          chatml.actions_to_text(step_actions)))
            first = False
            j += len(step_actions)

        input_ids, labels = chatml.tokenize_dialogue(
            self.tok, turns, add_system=True, with_labels=True)
        return {
            "input_ids": input_ids,
            "labels": labels,
            "images": images,
            "time_ids": time_ids.astype(np.int32),
            "task_id": self.task_id,
        }

    def _load_images(self, paths: List[str]) -> np.ndarray:
        # fast path: threaded C++ decode+resize+normalize (native/)
        # whenever no python-side augmentation is requested
        if self.transform is None:
            from streamvln_tpu import native
            if native.available():
                return native.load_preprocess_jpegs(
                    paths, self.image_size)
        from PIL import Image
        raw = []
        for p in paths:
            img = Image.open(p).convert("RGB")
            if self.transform is not None:
                img = self.transform(img)
            raw.append(np.asarray(img, np.uint8))
        return preprocess_frames_host(np.stack(raw), self.image_size)


def write_trajectory(root: str, episode_id: str, frames: np.ndarray,
                     instructions: Sequence[str],
                     actions: Sequence[int]) -> dict:
    """Write one episode in the trajectory format (the oracle generator's
    output; reference: streamvln_trajectory_generation.py:85-123).
    Returns the annotation entry (video path relative to root)."""
    from PIL import Image
    video_rel = os.path.join("images", episode_id)
    rgb_dir = os.path.join(root, video_rel, "rgb")
    os.makedirs(rgb_dir, exist_ok=True)
    for i, frame in enumerate(frames):
        Image.fromarray(frame).save(os.path.join(rgb_dir, f"{i:03d}.jpg"))
    return {
        "id": episode_id,
        "video": video_rel,
        "instructions": list(instructions),
        "actions": list(map(int, actions)),
    }


def write_annotations(root: str, entries: List[dict]):
    with open(os.path.join(root, "annotations.json"), "w") as f:
        json.dump(entries, f)
