"""Co-training quality closed-loop (VERDICT r3 #6).

The reference's stage-2 trains VLN mixed with QA/MMC4 data through
task-grouped batches (reference: streamvln_train.py:1440-1458). This
script validates the §2.8 mixture path END TO END: mixing a synthetic
QA task into VLN SFT must (a) leave VLN closed-loop SR intact and
(b) actually teach the QA task (held-out QA loss drops vs the
untrained model and vs the VLN-only model).

The QA task is learnable-by-construction: solid-color images with
"What is the dominant color?" -> color-word answers, loaded through
ConversationDataset + the mixture yaml DSL + TaskGroupedBatchSampler —
the exact production path (train.py --cotrain_yaml).

Usage:  python scripts/closed_loop_cotrain.py [--steps 300] ...
Prints one JSON line with vln-only vs cotrained SR and QA losses.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling scripts
sys.path.insert(0, os.path.dirname(_HERE))     # repo root
from closed_loop_validation import evaluate, generate_data  # noqa: E402

COLORS = {"red": (200, 30, 30), "green": (30, 200, 30),
          "blue": (30, 30, 200)}
QA_QUESTION = "<image>\nWhat is the dominant color?"


def make_qa_data(root: str, n: int, seed: int):
    """Solid-color images + color-word QA pairs (train split) and a
    held-out eval list."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    media = os.path.join(root, "qa_media")
    os.makedirs(media, exist_ok=True)
    entries = []
    names = list(COLORS)
    for i in range(n):
        color = names[int(rng.randint(len(names)))]
        base = np.array(COLORS[color], np.int16)
        img = np.clip(base[None, None, :]
                      + rng.randint(-20, 20, (48, 64, 3)), 0,
                      255).astype(np.uint8)
        fname = f"qa_{i:04d}.jpg"
        Image.fromarray(img).save(os.path.join(media, fname))
        entries.append({"id": i, "image": fname, "conversations": [
            {"from": "human", "value": QA_QUESTION},
            {"from": "gpt", "value": f"The image is mostly {color}."}]})
    json.dump(entries, open(os.path.join(root, "qa.json"), "w"))
    yaml_path = os.path.join(root, "mixture.yaml")
    with open(yaml_path, "w") as f:
        f.write("QA_datasets:\n"
                f"  - json_path: {os.path.join(root, 'qa.json')}\n"
                "    sampling_strategy: all\n")
    return yaml_path, media


def qa_loss(params, root: str, media: str, n_eval: int,
            seed: int) -> float:
    """Mean CE on a held-out QA batch through the production
    collate/forward path."""
    import jax

    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.collate import collate
    from streamvln_tpu.data.cotrain_datasets import ConversationDataset
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln

    cfg = tiny_streamvln()
    eval_root = os.path.join(root, "qa_eval")
    yaml_path, eval_media = make_qa_data(eval_root, n_eval, seed)
    entries = json.load(open(os.path.join(eval_root, "qa.json")))
    ds = ConversationDataset(ByteTokenizer(), cfg, entries, eval_media,
                             task_id=1)
    batch = collate([ds[i] for i in range(len(ds))], cfg,
                    length_buckets=(512, 1024))
    batch = {k: v for k, v in batch.items()
             if k not in ("time_ids", "task_type", "task_id")}
    images = batch.pop("images")
    loss, _ = jax.jit(
        lambda p, im, lay: streamvln.forward_train(p, cfg, im, lay)
    )(params, images, batch)
    return float(loss)


def train(traj: str, out_dir: str, steps: int, lr: float,
          batch_size: int, cotrain_yaml=None, media=None):
    from streamvln_tpu import train as train_entry
    argv = [
        "--video_folders", traj,
        "--output_dir", out_dir,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", str(steps),
        "--batch_size", str(batch_size),
        "--log_steps", "50", "--save_steps", "100000",
        "--dp", "1", "--fsdp", "1",
        "--learning_rate", str(lr),
    ]
    if cotrain_yaml:
        argv += ["--cotrain_yaml", cotrain_yaml,
                 "--media_root_qa", media]
    import jax
    state = train_entry.main(argv)
    return jax.device_get(state.params)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_episodes", type=int, default=40)
    p.add_argument("--qa_samples", type=int, default=60)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--cotrain_steps", type=int, default=400)
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_episodes", type=int, default=8)
    p.add_argument("--max_eval_steps", type=int, default=120)
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--seed", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    if os.environ.get("CL_BACKEND", "cpu") == "cpu":
        # tiny config: CPU is plenty, and this must not steal the TPU
        # from a concurrent training/bench job. Must run BEFORE any
        # backend touch (jax.default_backend() would initialize axon
        # and the update would no longer take effect).
        jax.config.update("jax_platforms", "cpu")

    root = args.workdir or tempfile.mkdtemp(prefix="closed_loop_ct_")
    traj = os.path.join(root, "traj")
    n = generate_data(traj, args.train_episodes, args.seed)
    yaml_path, media = make_qa_data(root, args.qa_samples, args.seed)
    print(f"{n} oracle episodes + {args.qa_samples} QA samples",
          flush=True)

    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.models import streamvln
    untrained = streamvln.init(jax.random.PRNGKey(0), tiny_streamvln())
    qa0 = qa_loss(untrained, root, media, 12, args.seed + 1)

    t0 = time.time()
    vln_only = train(traj, os.path.join(root, "run_vln"), args.steps,
                     args.learning_rate, args.batch_size)
    print(f"vln-only trained ({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    cotrained = train(traj, os.path.join(root, "run_ct"),
                      args.cotrain_steps, args.learning_rate,
                      args.batch_size, cotrain_yaml=yaml_path,
                      media=media)
    print(f"cotrained ({time.time() - t0:.1f}s)", flush=True)

    agg_vln = evaluate(vln_only, root, "vln_only", args.eval_episodes,
                       args.max_eval_steps)
    agg_ct = evaluate(cotrained, root, "cotrained", args.eval_episodes,
                      args.max_eval_steps)
    qa_vln = qa_loss(vln_only, root, media, 12, args.seed + 1)
    qa_ct = qa_loss(cotrained, root, media, 12, args.seed + 1)

    result = {
        "vln_only": {**agg_vln, "qa_loss": round(qa_vln, 4)},
        "cotrained": {**agg_ct, "qa_loss": round(qa_ct, 4)},
        "qa_loss_untrained": round(qa0, 4),
        "workdir": root,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
