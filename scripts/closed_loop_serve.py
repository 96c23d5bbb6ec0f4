"""Serving closed-loop: navigate THROUGH the HTTP server.

The serving stack (serve/http_server.py — behavioral parity with the
reference's Flask realworld server, streamvln/http_realworld_server.py:
61-182) has protocol unit tests but had never driven navigation
end-to-end. This script proves the path: the trained tiny checkpoint
behind a real HTTP socket, JPEG frames POSTed in, num_future_steps
action bursts returned, reset flag starting episodes — measured SR on
held-out observable-goal episodes against the in-process agent's SR on
the same episodes (closed_loop_validation protocol).

Serving semantics under test (deliberately the reference's, drift and
all): each POST advances the agent num_future_steps sub-steps feeding
the SAME request frame (the client robot executes the returned burst
between requests and does not stream intermediate frames), so the
agent's frame memory holds request-time frames duplicated per sub-step
— a distribution the in-process evaluator never produces. The
reference never measured this path; this script does.

Protocol:
1. Oracle data + tiny SFT (same as scripts/closed_loop_validation.py),
   or --reuse_workdir to skip retraining.
2. AgentService + stdlib ThreadingHTTPServer on 127.0.0.1.
3. HTTP client drives FakeNavEnv(observable_goal=True) far-goal
   episodes: reset=true on episode start, JPEG frame per request,
   executes the returned action burst, stops on action 0.
4. Same episodes through the in-process VLNAgent for the reference row.

Usage: python scripts/closed_loop_serve.py [--steps 300] ...
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root
sys.path.insert(0, _HERE)                    # sibling scripts

from closed_loop_validation import (  # noqa: E402
    INSTRUCTION, evaluate, far_episodes, generate_data)


def _post(port: int, rgb: np.ndarray, reset: bool,
          instruction: str | None) -> dict:
    """POST one frame as the reference's client would (JPEG over HTTP);
    json body with image_b64 (serve/http_server._parse_multipart)."""
    import urllib.request

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=95)
    payload = {"image_b64": base64.b64encode(buf.getvalue()).decode(),
               "reset": reset}
    if instruction is not None:
        payload["instruction"] = instruction
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/eval_vln",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read().decode())


def eval_through_http(params, n_eval: int, max_steps: int,
                      port: int) -> dict:
    """Serve the agent over HTTP and drive far-goal episodes as a
    remote client; returns the aggregate metric row."""
    import jax.numpy as jnp
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.eval.fake_env import FakeNavEnv
    from streamvln_tpu.serve.http_server import AgentService, serve
    from streamvln_tpu.streaming.engine import StreamingEngine

    cfg = tiny_streamvln()
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=10,
        cache_capacity=4096, feat_slots=80,
        buckets=(256, 512, 768, 1024), spec_lookup=6)
    agent = VLNAgent(engine, tok)
    nfs = cfg.num_future_steps
    service = AgentService(agent, INSTRUCTION, num_future_steps=nfs,
                           run_root=tempfile.mkdtemp(prefix="serve_cl_"))
    server = serve(service, "127.0.0.1", port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        episodes = far_episodes(n_eval, seed=77)
        env = FakeNavEnv(episodes, max_episode_steps=max_steps,
                         rgb_shape=(48, 64, 3), observable_goal=True)
        rows = []
        for ep in episodes:
            env.current_episode = ep
            obs = env.reset()
            first = True
            while not env.episode_over:
                resp = _post(port, obs["rgb"], reset=first,
                             instruction=INSTRUCTION if first else None)
                first = False
                burst = resp["action"]
                assert burst, resp
                for a in burst:
                    obs = env.step(int(a))
                    if env.episode_over:
                        break
            rows.append(env.get_metrics())
        agg = {
            "success_rate": float(np.mean([r["success"] for r in rows])),
            "spl": float(np.mean([r["spl"] for r in rows])),
            "oracle_success": float(np.mean([r["oracle_success"]
                                             for r in rows])),
            "navigation_error": float(np.mean([r["distance_to_goal"]
                                               for r in rows])),
            "ndtw": float(np.mean([r.get("ndtw", 0.0) for r in rows])),
            "episodes": len(rows),
        }
        if engine.decode_forwards:
            agg["tokens_per_forward"] = round(
                engine.decode_tokens / engine.decode_forwards, 3)
        return {k: round(v, 4) if isinstance(v, float) else v
                for k, v in agg.items()}
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_episodes", type=int, default=40)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_episodes", type=int, default=8)
    p.add_argument("--max_eval_steps", type=int, default=120)
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--port", type=int, default=5899)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--skip_in_process", action="store_true",
                   help="skip the in-process comparison row")
    args = p.parse_args(argv)

    import jax
    if os.environ.get("CL_BACKEND", "cpu") == "cpu":
        # tiny config: CPU is plenty; must not steal the TPU (and must
        # run before any backend touch)
        jax.config.update("jax_platforms", "cpu")

    root = args.workdir or tempfile.mkdtemp(prefix="closed_serve_")
    traj = os.path.join(root, "traj")
    t0 = time.time()
    n = generate_data(traj, args.train_episodes, args.seed)
    print(f"generated {n} oracle episodes ({time.time() - t0:.1f}s)",
          flush=True)
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
        "--log_steps", "25", "--save_steps", "100000",
        "--dp", "1", "--fsdp", "1",
        "--learning_rate", str(args.learning_rate),
    ])
    print(f"trained {args.steps} steps ({time.time() - t0:.1f}s)",
          flush=True)
    trained = jax.device_get(state.params)

    t0 = time.time()
    agg_http = eval_through_http(trained, args.eval_episodes,
                                 args.max_eval_steps, args.port)
    print(f"HTTP eval done ({time.time() - t0:.1f}s)", flush=True)
    result = {"serve_http": agg_http, "workdir": root}
    if not args.skip_in_process:
        result["in_process"] = evaluate(
            trained, root, "serve_ref", args.eval_episodes,
            args.max_eval_steps)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
