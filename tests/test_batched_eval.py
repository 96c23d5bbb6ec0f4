"""Batched multi-env evaluator over parallel fake envs."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.eval.batched_evaluator import BatchedVLNEvaluator
from streamvln_tpu.eval.fake_env import FakeNavEnv, make_episodes
from streamvln_tpu.models import streamvln
from streamvln_tpu.streaming.engine import StreamingEngine


def test_batched_eval_runs_all_episodes(tmp_path):
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    n_envs = 3
    engine = StreamingEngine(
        params, cfg, n_envs=n_envs, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)

    episodes = make_episodes(5, seed=0)
    ev = BatchedVLNEvaluator(
        lambda: FakeNavEnv([], max_episode_steps=500,
                           rgb_shape=(48, 64, 3)),
        agent, str(tmp_path), max_steps_per_episode=6)
    results = ev.run(episodes)
    assert len(results) == 5
    ids = sorted(r["episode_id"] for r in results)
    assert ids == sorted(e.episode_id for e in episodes)
    for r in results:
        assert 0 <= r["spl"] <= 1
        assert r["steps"] >= 1
    # result.json has one line per episode
    lines = open(tmp_path / "result.json").read().splitlines()
    assert len(lines) == 5
