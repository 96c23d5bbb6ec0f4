"""Batched multi-env evaluator over parallel fake envs."""
import pytest
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


@pytest.mark.slow
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


def _fake_env_for_worker():
    return FakeNavEnv([], max_episode_steps=500, rgb_shape=(48, 64, 3))


def test_remote_env_proxy_matches_local():
    from streamvln_tpu.eval.env_workers import RemoteEnv
    episodes = make_episodes(2, seed=3)
    local = _fake_env_for_worker()
    remote = RemoteEnv(_fake_env_for_worker)
    try:
        for env in (local, remote):
            env.current_episode = episodes[0]
        o_l, o_r = local.reset(), remote.reset()
        np.testing.assert_array_equal(o_l["rgb"], o_r["rgb"])
        o_l, o_r = local.step(1), remote.step(1)
        np.testing.assert_array_equal(o_l["rgb"], o_r["rgb"])
        assert local.episode_over == remote.episode_over
        # async protocol
        remote.step_async(2)
        o_r = remote.step_wait()
        o_l = local.step(2)
        np.testing.assert_array_equal(o_l["rgb"], o_r["rgb"])
        assert local.get_metrics().keys() == remote.get_metrics().keys()
    finally:
        remote.close()


@pytest.mark.slow
def test_batched_eval_with_multiprocess_env_workers(tmp_path):
    from streamvln_tpu.eval.env_workers import remote_env_factory
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=2, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)

    episodes = make_episodes(3, seed=1)
    ev = BatchedVLNEvaluator(
        remote_env_factory(_fake_env_for_worker), agent,
        str(tmp_path / "mp"), max_steps_per_episode=6)
    try:
        results = ev.run(episodes)
    finally:
        for env in ev.envs:
            env.close()
    assert len(results) == 3
    ids = sorted(r["episode_id"] for r in results)
    assert ids == sorted(e.episode_id for e in episodes)


@pytest.mark.slow
def test_eval_cli_batched_env_workers_default(tmp_path):
    """eval_cli --n_envs > 1 defaults to the async multi-process env
    worker topology (batched_evaluator + env_workers), the deployed
    equivalent of the reference's torchrun x8 eval
    (streamvln_eval.py:219)."""
    from streamvln_tpu import eval_cli
    final = eval_cli.main([
        "--model_size", "tiny", "--env_backend", "fake",
        "--num_episodes", "4", "--n_envs", "2",
        "--max_steps_per_episode", "6",
        "--output_path", str(tmp_path / "out")])
    assert final["length"] == 4
    lines = open(tmp_path / "out" / "result.json").read().splitlines()
    assert len(lines) == 4


@pytest.mark.slow
def test_eval_cli_bits4_quantized_inference(tmp_path):
    """--bits 4 quantizes the loaded model at build time (reference
    model-builder load_4bit) and the run completes on the fake env;
    the tiny LLM's shapes are kernel-ineligible so this exercises the
    dequant fallback dispatch end-to-end."""
    from streamvln_tpu import eval_cli
    final = eval_cli.main([
        "--model_size", "tiny", "--env_backend", "fake",
        "--num_episodes", "2", "--bits", "4",
        "--max_steps_per_episode", "6",
        "--output_path", str(tmp_path / "out")])
    assert final["length"] == 2
