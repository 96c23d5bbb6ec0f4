"""Closed-loop DAgger effectiveness proof (VERDICT r3 #1).

The reference's DAgger collector exists to produce data that IMPROVES
the policy (reference: streamvln/streamvln_dagger.py:154-443). This
script proves our `dagger.py` does exactly that, end to end, on the
observable-goal fake env:

1. Train a deliberately WEAK model: SFT on a TINY oracle set
   (--weak_episodes, default 2) — one or two trajectories only cover a
   narrow slice of the bearing-pixel space, so the policy wanders on
   held-out headings (measured: SR 0).
2. Evaluate it on held-out far-goal episodes -> weak SR/NE.
3. Run the REAL DAgger machinery (beta = p^iter segment mixing, expert
   takeover on intolerable error, STOP replacement, save gates) with
   the weak agent driving, collecting expert-corrected trajectories
   from the states the weak policy actually visits.
4. Retrain FROM SCRATCH for the same step budget on
   oracle-small + DAgger-collected.
5. Re-evaluate: SR must improve / NE must drop vs the weak baseline,
   at an equal training budget (same --steps) — the improvement is
   attributable to the DAgger data, not extra steps.

Note the save gate is SUPPOSED to reject near-optimal rollouts
(pl < 0.93 requires the taken path to be >=7.5% longer than optimal —
reference: streamvln_dagger.py:52-55,405): DAgger data must come from
states an imperfect policy visits; oracle data already covers the
optimal path. A fully-trained model therefore yields zero saves by
design (measured: SR-1.0 model -> 0/40 saved). On STRAIGHT fake
episodes the gate is geometrically unpassable (turning adds steps but
no path length; measured 0 saves at every beta), so collection runs on
BENT reference paths like R2R's — which requires the observation to
render bearing to the CURRENT WAYPOINT, not the goal (goal-bearing
pixels paired with waypoint-following expert actions measurably poison
the policy: NE 0.51 -> 1.19 m). FakeNavEnv's observable_goal mode does
exactly that (identical on straight paths).

Also reports the save-gate statistics (attempted vs saved): gates
rejecting imperfect episodes is part of the reference contract
(streamvln_dagger.py:405).

Usage:  python scripts/closed_loop_dagger.py [--steps 300] ...
Results land as one JSON line; see PARITY.md for measured numbers.
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
from closed_loop_validation import (INSTRUCTION, evaluate,  # noqa: E402
                                    far_episodes, generate_data)


def train(traj_dirs, out_dir: str, steps: int, lr: float,
          batch_size: int):
    from streamvln_tpu import train as train_entry
    state = train_entry.main([
        "--video_folders", ",".join(traj_dirs),
        "--output_dir", out_dir,
        "--model_size", "tiny",
        "--num_frames", "8", "--num_future_steps", "2",
        "--num_history", "2",
        "--num_steps", str(steps),
        "--batch_size", str(batch_size),
        "--log_steps", "50", "--save_steps", "100000",
        "--dp", "1", "--fsdp", "1",
        "--learning_rate", str(lr),
    ])
    import jax
    return jax.device_get(state.params)


def bent_episodes(n: int, seed: int):
    """Collection episodes with a DOG-LEG reference path (midpoint
    offset ~1.5 m off the straight line) — R2R-like curvy geometry.

    Bent paths give the save gate its headroom
    (pl = straight_dist / taken < 0.93 holds by construction for a
    well-followed rollout, exactly as in R2R's curvy episodes), and
    FakeNavEnv renders bearing-to-current-waypoint so the pixels stay
    consistent with the expert's waypoint-following actions."""
    from streamvln_tpu.eval.fake_env import FakeEpisode
    rng = np.random.RandomState(seed)
    eps = []
    for i in range(n):
        start = rng.uniform(-3, 3, 2)
        ang = rng.uniform(-np.pi, np.pi)
        dist = rng.uniform(3.5, 5.0)
        goal = start + dist * np.array([np.cos(ang), np.sin(ang)])
        perp = np.array([-np.sin(ang), np.cos(ang)])
        mid = (start + goal) / 2 + perp * rng.uniform(1.0, 2.0) \
            * rng.choice([-1.0, 1.0])
        ref = np.concatenate([np.linspace(start, mid, 3),
                              np.linspace(mid, goal, 4)[1:]])
        eps.append(FakeEpisode(
            episode_id=str(i), scene_id=f"scenes/s{i % 2}/s{i % 2}.glb",
            instruction_text=INSTRUCTION,
            start_position=start,
            start_heading=float(rng.uniform(-np.pi, np.pi)),
            goal_position=goal,
            reference_path=ref))
    return eps


def collect_dagger(params, out_dir: str, n_episodes: int, seed: int,
                   data_iteration: int, max_steps: int) -> dict:
    """Real dagger.py collection with the (weak) learner driving."""
    import jax.numpy as jnp

    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.dagger import DAggerCollector
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.eval.fake_env import FakeNavEnv
    from streamvln_tpu.streaming.engine import StreamingEngine
    from streamvln_tpu.trajectory_generation import merge

    cfg = tiny_streamvln()
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=10,
        cache_capacity=4096, feat_slots=80,
        buckets=(256, 512, 768, 1024))
    agent = VLNAgent(engine, tok)
    # collection episodes: BENT reference paths (see bent_episodes /
    # module docstring), disjoint seed from eval; uniform instruction
    # keeps the policy pixel-driven
    episodes = bent_episodes(n_episodes, seed=seed)
    env = FakeNavEnv(episodes, max_episode_steps=max_steps,
                     rgb_shape=(48, 64, 3), observable_goal=True)
    collector = DAggerCollector(
        agent, out_dir, p=0.75, data_iteration=data_iteration,
        num_future_steps=cfg.num_future_steps, seed=seed,
        max_steps=max_steps)
    collector.update_dataset(env)
    merged = merge(out_dir, 1)
    return {"attempted": n_episodes, "saved": len(merged)}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weak_episodes", type=int, default=2)
    p.add_argument("--dagger_episodes", type=int, default=40)
    p.add_argument("--dagger_data_it", type=int, default=1)
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

    root = args.workdir or tempfile.mkdtemp(prefix="closed_loop_dagger_")
    oracle = os.path.join(root, "oracle_small")
    t0 = time.time()
    n = generate_data(oracle, args.weak_episodes, args.seed)
    print(f"oracle-small: {n} episodes ({time.time() - t0:.1f}s)",
          flush=True)

    t0 = time.time()
    weak = train([oracle], os.path.join(root, "run_weak"), args.steps,
                 args.learning_rate, args.batch_size)
    print(f"weak model trained ({time.time() - t0:.1f}s)", flush=True)
    agg_weak = evaluate(weak, root, "weak", args.eval_episodes,
                        args.max_eval_steps)
    print("weak:", json.dumps(agg_weak), flush=True)

    dagger_dir = os.path.join(root, "dagger")
    t0 = time.time()
    gate = collect_dagger(weak, dagger_dir, args.dagger_episodes,
                          seed=args.seed + 100,
                          data_iteration=args.dagger_data_it,
                          max_steps=args.max_eval_steps)
    print(f"dagger collected {gate['saved']}/{gate['attempted']} "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    improved = train([oracle, dagger_dir],
                     os.path.join(root, "run_dagger"), args.steps,
                     args.learning_rate, args.batch_size)
    print(f"retrained on oracle+dagger ({time.time() - t0:.1f}s)",
          flush=True)
    agg_dagger = evaluate(improved, root, "dagger", args.eval_episodes,
                          args.max_eval_steps)
    print("dagger:", json.dumps(agg_dagger), flush=True)

    result = {"weak": agg_weak, "dagger": agg_dagger, "gate": gate,
              "steps_each": args.steps, "workdir": root}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
