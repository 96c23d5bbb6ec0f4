"""Co-training datasets: mixture DSL, conversation QA, MMC4 interleave."""
import json
import os

import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.collate import CombineDataset, collate
from streamvln_tpu.data.cotrain_datasets import (
    ConversationDataset, MMC4Dataset, apply_sampling,
    build_cotraining_datasets, load_mixture_entries)
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def test_sampling_strategies():
    entries = [{"video": f"nextqa/v{i}"} for i in range(10)] \
        + [{"video": f"ego4d/v{i}"} for i in range(10)]
    assert len(apply_sampling(entries, "first:5")) == 5
    assert apply_sampling(entries, "end:3")[-1] is entries[-1]
    assert len(apply_sampling(entries, "random:7")) == 7
    assert len(apply_sampling(entries, "first:50%")) == 10
    only = apply_sampling(entries, "all", subset="nextqa")
    assert len(only) == 10 and all("nextqa" in e["video"] for e in only)


@pytest.fixture(scope="module")
def media_tree(tmp_path_factory):
    from PIL import Image
    root = str(tmp_path_factory.mktemp("media"))
    rng = np.random.RandomState(0)
    # video dir with 12 frames
    os.makedirs(os.path.join(root, "vid0"))
    for i in range(12):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            os.path.join(root, "vid0", f"{i:03d}.jpg"))
    # single images
    for name in ("img0.jpg", "img1.jpg"):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            os.path.join(root, name))
    return root


def test_conversation_dataset_video(media_tree):
    cfg = tiny_streamvln()
    entries = [{"id": 0, "video": "vid0", "conversations": [
        {"from": "human", "value": "What happens in the video?"},
        {"from": "gpt", "value": "A thing happens."}]}]
    ds = ConversationDataset(ByteTokenizer(), cfg, entries, media_tree,
                             task_id=1, num_frames_qa=4)
    s = ds[0]
    assert (s["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 4
    assert len(s["images"]) == 4
    assert s["task_id"] == 1
    assert (s["labels"] != IGNORE_INDEX).sum() > 0
    # collates with the shared collator
    batch = collate([s], cfg, length_buckets=(512, 1024))
    assert batch["images"].shape[0] == 1


def test_conversation_dataset_single_image(media_tree):
    cfg = tiny_streamvln()
    entries = [{"id": 1, "image": "img0.jpg", "conversations": [
        {"from": "human", "value": "<image>\nDescribe."},
        {"from": "gpt", "value": "A noisy image."}]}]
    ds = ConversationDataset(ByteTokenizer(), cfg, entries, media_tree,
                             task_id=2)
    s = ds[0]
    assert (s["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 1
    assert len(s["images"]) == 1


def test_mmc4_interleave(media_tree):
    cfg = tiny_streamvln()
    entries = [{
        "text_list": ["First sentence.", "Second sentence.",
                      "Third sentence."],
        "image_info": [
            {"image_name": "img0.jpg", "matched_text_index": 0},
            {"image_name": "img1.jpg", "matched_text_index": 2},
        ],
    }]
    ds = MMC4Dataset(ByteTokenizer(), cfg, entries, media_tree)
    s = ds[0]
    assert (s["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 2
    assert len(s["images"]) == 2
    assert s["task_id"] == 3
    # sentinel for image 0 precedes "First sentence." text
    tok = ByteTokenizer()
    decoded = tok.decode(s["input_ids"].tolist())
    assert decoded.index("<image>") < decoded.index("First")


def test_mixture_yaml_roundtrip(media_tree, tmp_path):
    qa_json = str(tmp_path / "qa.json")
    entries = [{"id": i, "video": "vid0", "conversations": [
        {"from": "human", "value": "Q?"},
        {"from": "gpt", "value": "A."}]} for i in range(6)]
    with open(qa_json, "w") as f:
        json.dump(entries, f)
    mmc4_dir = tmp_path / "mmc4"
    mmc4_dir.mkdir()
    with open(mmc4_dir / "shard0.jsonl", "w") as f:
        f.write(json.dumps({
            "text_list": ["Hello."],
            "image_info": [{"image_name": "img0.jpg",
                            "matched_text_index": 0}]}) + "\n")
    yaml_path = str(tmp_path / "mix.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"""QA_datasets:
  - json_path: {qa_json}
    sampling_strategy: first:4
MMC4_datasets:
  - json_path: {mmc4_dir}
""")
    cfg = tiny_streamvln()
    datasets = build_cotraining_datasets(
        ByteTokenizer(), cfg, yaml_path,
        media_roots={"qa": media_tree, "mmc4": media_tree})
    assert len(datasets) == 2
    assert len(datasets[0]) == 4 and datasets[0].task_id == 1
    assert len(datasets[1]) == 1 and datasets[1].task_id == 3
    comb = CombineDataset(datasets)
    assert sorted(set(comb.task_ids)) == [1, 3]
