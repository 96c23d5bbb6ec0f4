"""Mid-training evaluation hook.

Reference surface: llava/train/llava_trainer_eval.py:8-50 —
`LLaVAEvalTrainer.evaluate` shells out to `accelerate launch -m
lmms_eval` mid-training and parses results.json back into a metric
dict. The TPU-native equivalent runs an in-process held-out episode
evaluation (fake-env VLN episodes by default — no simulator or
external harness needed) against the CURRENT training parameters and
returns the aggregated navigation metrics, which train.py folds into
train_log.jsonl.
"""
from __future__ import annotations

import os
import tempfile
from typing import List, Optional


class MidTrainingEvaluator:
    """Evaluate train-state params on held-out episodes every N steps.

    Builds a fresh StreamingEngine per call (params change every step;
    engines are cheap at eval batch sizes) and drives the standard
    VLNEvaluator loop over `n_episodes` fake-env episodes.
    """

    def __init__(self, cfg, tokenizer, *, n_episodes: int = 4,
                 max_steps_per_episode: int = 12, seed: int = 0,
                 episodes: Optional[List] = None,
                 env_factory=None, max_new_tokens: int = 8,
                 cache_capacity: int = 2048,
                 buckets=(512, 768, 1024)):
        from streamvln_tpu.eval.fake_env import (FakeNavEnv,
                                                 make_episodes)
        self.cfg = cfg
        self.tok = tokenizer
        self.max_steps = max_steps_per_episode
        self.max_new_tokens = max_new_tokens
        self.cache_capacity = cache_capacity
        self.buckets = buckets
        self.episodes = episodes if episodes is not None else \
            make_episodes(n_episodes, seed=seed)
        self.env_factory = env_factory or (
            lambda: FakeNavEnv(self.episodes,
                               max_episode_steps=max_steps_per_episode))

    def evaluate(self, params, step: int) -> dict:
        """Returns {"eval/success_rate": ..., "eval/spl": ..., ...}."""
        import jax.numpy as jnp

        from streamvln_tpu.agent import VLNAgent
        from streamvln_tpu.eval.evaluator import VLNEvaluator
        from streamvln_tpu.streaming.engine import StreamingEngine

        import jax
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
        engine = StreamingEngine(
            params, self.cfg, stop_ids=(self.tok.im_end_id,),
            compute_dtype=dtype, max_new_tokens=self.max_new_tokens,
            cache_capacity=self.cache_capacity, buckets=self.buckets,
            # the live training params stay referenced by the trainer,
            # so fusing here would DUPLICATE q/k/v + gate/up in HBM
            # (~4 GB at 7B) on top of optimizer state — skip it for the
            # short mid-training eval
            fuse_proj=False)
        agent = VLNAgent(engine, self.tok)
        with tempfile.TemporaryDirectory() as tmp:
            ev = VLNEvaluator(
                self.env_factory(), agent, os.path.join(tmp, "eval"),
                rank=0, world_size=1,
                max_steps_per_episode=self.max_steps)
            partial = ev.eval_action()
            agg = ev.aggregate([partial])
        return {f"eval/{k}": float(v) for k, v in agg.items()
                if isinstance(v, (int, float))}
