"""Quantization quality closed-loop (VERDICT r3 #5).

Round 3 pinned kv_int8's ~5% softmax-mass drift only engine-vs-itself;
this script converts that into a behavioral bound: the SAME trained
checkpoint must still NAVIGATE (SR ~ 1.0 on held-out observable-goal
episodes) under every quantization mode the framework ships:

  f32 (baseline) | int8 weights | int4 weights (fused Pallas kernel
  path) | int8 KV cache | int8 weights + int8 KV.

Weight quantization uses the same `quant.quantize_llm` the eval CLI's
--bits {4,8} path uses (reference class: bitsandbytes load_4bit/
load_8bit, streamvln_train.py:1564-1600); kv_int8 is the engine flag.

Usage:  python scripts/closed_loop_quant.py [--steps 300] ...
Prints one JSON line {mode: {sr, spl, ne, ...}}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # sibling scripts
sys.path.insert(0, os.path.dirname(_HERE))     # repo root
from closed_loop_validation import far_episodes, generate_data  # noqa: E402


def evaluate_mode(params, root: str, tag: str, n_eval: int,
                  max_steps: int, bits: int = 32,
                  kv_int8: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.eval.evaluator import VLNEvaluator
    from streamvln_tpu.eval.fake_env import FakeNavEnv
    from streamvln_tpu.models import quant
    from streamvln_tpu.streaming.engine import StreamingEngine

    cfg = tiny_streamvln()
    tok = ByteTokenizer()
    params = jax.device_get(params)
    if bits in (4, 8):
        params = quant.quantize_llm(params, bits=bits)
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=10,
        cache_capacity=4096, feat_slots=80,
        buckets=(256, 512, 768, 1024), kv_int8=kv_int8)
    agent = VLNAgent(engine, tok)
    env = FakeNavEnv(far_episodes(n_eval, seed=77),
                     max_episode_steps=max_steps,
                     rgb_shape=(48, 64, 3), observable_goal=True)
    ev = VLNEvaluator(env, agent, os.path.join(root, f"eval_{tag}"),
                      max_steps_per_episode=max_steps)
    agg = ev.aggregate([ev.eval_action()])
    return {k: round(float(v), 4) for k, v in agg.items()
            if isinstance(v, (int, float))}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_episodes", type=int, default=40)
    p.add_argument("--steps", type=int, default=300)
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

    root = args.workdir or tempfile.mkdtemp(prefix="closed_loop_quant_")
    traj = os.path.join(root, "traj")
    n = generate_data(traj, args.train_episodes, args.seed)
    print(f"generated {n} oracle episodes", flush=True)

    from streamvln_tpu import train as train_entry
    t0 = time.time()
    state = train_entry.main([
        "--video_folders", traj,
        "--output_dir", os.path.join(root, "run"),
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", str(args.steps),
        "--batch_size", str(args.batch_size),
        "--log_steps", "50", "--save_steps", "100000",
        "--dp", "1", "--fsdp", "1",
        "--learning_rate", str(args.learning_rate),
    ])
    print(f"trained ({time.time() - t0:.1f}s)", flush=True)
    trained = jax.device_get(state.params)

    modes = [("f32", 32, False), ("int8", 8, False),
             ("int4", 4, False), ("kv_int8", 32, True),
             ("int8+kv_int8", 8, True)]
    result = {}
    for tag, bits, kvq in modes:
        t0 = time.time()
        result[tag] = evaluate_mode(
            trained, root, tag, args.eval_episodes,
            args.max_eval_steps, bits=bits, kv_int8=kvq)
        print(tag, json.dumps(result[tag]),
              f"({time.time() - t0:.1f}s)", flush=True)

    result["workdir"] = root
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
