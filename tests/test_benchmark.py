"""External benchmark harness (lmms_eval-style adapter; reference
contract: llava/train/llava_trainer_eval.py:8-50 — subprocess +
results.json parse-back)."""
import json
import os

import numpy as np
import pytest

from streamvln_tpu.eval.benchmark import (extract_choice,
                                          run_external_benchmark,
                                          score_answer)


def test_scoring_rules():
    assert score_answer("The answer is B.", "b", "multiple_choice") == 1
    assert score_answer("I think (C)", "B", "multiple_choice") == 0
    assert extract_choice("no letters here") is None
    assert score_answer("A red door!", "a red door", "exact") == 1
    assert score_answer("it is a red door", "red door", "contains") == 1
    assert score_answer("blue door", "red door", "contains") == 0


def _write_task(tmp_path, name, entries):
    with open(tmp_path / f"{name}.jsonl", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")


@pytest.mark.slow
def test_subprocess_benchmark_roundtrip(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "media"
    os.makedirs(img_dir)
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        img_dir / "im0.jpg")
    _write_task(tmp_path, "toyvqa", [
        {"id": 0, "image": "im0.jpg",
         "question": "<image>\nWhat color? A. red B. blue",
         "answer": "A", "answer_type": "multiple_choice"},
        {"id": 1, "question": "Say hi", "answer": "hi",
         "answer_type": "contains"},
    ])
    out_dir = tmp_path / "out"
    flat = run_external_benchmark(
        tasks="toyvqa", task_dir=str(tmp_path),
        output_path=str(out_dir), model_size="tiny",
        media_root=str(img_dir),
        extra_env={"JAX_PLATFORM_NAME": "cpu"})
    assert "toyvqa_accuracy" in flat
    assert "toyvqa_contains_match" in flat
    # artifacts in the lmms_eval shape
    payload = json.load(open(out_dir / "results.json"))
    assert set(payload["results"]) == {"toyvqa"}
    samples = [json.loads(l) for l in
               open(out_dir / "samples_toyvqa.jsonl")]
    assert len(samples) == 2 and all("score" in s for s in samples)


def test_rouge_l_and_tfidf_scores():
    """Interleave-benchmark metrics (reference
    llava/eval/evaluate_interleave.py): ROUGE-L F and TF-IDF cosine."""
    from streamvln_tpu.eval.benchmark import (rouge_l, score_answer,
                                              tfidf_similarity)
    assert rouge_l("the red door is open", "the red door is open") == 1.0
    assert rouge_l("a b c", "x y z") == 0.0
    mid = rouge_l("the red door", "the blue door")
    assert 0.0 < mid < 1.0
    assert tfidf_similarity("same words here", "same words here") > 0.99
    assert tfidf_similarity("alpha beta", "gamma delta") < 0.1
    assert score_answer("the red door", "the red door", "rouge_l") == 1.0
    assert 0 <= score_answer("a cat", "a dog", "tfidf_sim") <= 1
