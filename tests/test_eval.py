"""Eval harness tests: metric math, fake env, full episode loop with
resume."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.eval.evaluator import VLNEvaluator
from streamvln_tpu.eval.fake_env import (
    FakeNavEnv, FakeEpisode, make_episodes)
from streamvln_tpu.eval.metrics import EpisodeTracker, ndtw
from streamvln_tpu.models import streamvln
from streamvln_tpu.streaming.engine import StreamingEngine


# -- metrics ------------------------------------------------------------

def test_success_requires_stop():
    t = EpisodeTracker(goal=[2.0, 0.0])
    t.reset([0.0, 0.0])
    t.update([2.0, 0.0], stop_called=False)
    assert t.metrics()["success"] == 0.0
    t.update([2.0, 0.0], stop_called=True)
    m = t.metrics()
    assert m["success"] == 1.0
    assert m["spl"] == pytest.approx(1.0)


def test_spl_penalizes_detours():
    t = EpisodeTracker(goal=[2.0, 0.0])
    t.reset([0.0, 0.0])
    t.update([0.0, 2.0])     # detour
    t.update([2.0, 2.0])
    t.update([2.0, 0.0], stop_called=True)
    m = t.metrics()
    assert m["success"] == 1.0
    assert m["spl"] == pytest.approx(2.0 / 6.0)
    assert m["path_length"] == pytest.approx(6.0)
    assert m["pl"] == pytest.approx(2.0 / 6.0)


def test_oracle_metrics():
    t = EpisodeTracker(goal=[4.0, 0.0])
    t.reset([0.0, 0.0])
    t.update([2.5, 0.0])      # min dist 1.5 < 3 -> oracle success
    t.update([0.0, 0.0], stop_called=True)  # walks back, fails
    m = t.metrics()
    assert m["success"] == 0.0
    assert m["oracle_success"] == 1.0
    assert m["oracle_navigation_error"] == pytest.approx(1.5)
    assert m["oracle_spl"] > 0


def test_ndtw_perfect_path():
    ref = np.linspace([0, 0], [3, 0], 5)
    assert ndtw(ref, ref) > 0.9
    bad = ref + np.array([0, 10.0])
    assert ndtw(bad, ref) < 0.2


# -- fake env -----------------------------------------------------------

def test_fake_env_geometry():
    ep = FakeEpisode("0", "s/x/y.glb", "go", [0, 0], 0.0, [1.0, 0.0])
    env = FakeNavEnv([ep], max_episode_steps=10)
    env.current_episode = ep
    obs = env.reset()
    assert obs["rgb"].shape == (480, 640, 3)
    # 4 forward steps = 1m east -> at goal
    for _ in range(4):
        obs = env.step(1)
    env.step(0)
    m = env.get_metrics()
    assert m["success"] == 1.0
    assert m["distance_to_goal"] == pytest.approx(0.0, abs=1e-6)
    assert env.episode_over


def test_fake_env_turns():
    ep = FakeEpisode("0", "s/x/y.glb", "go", [0, 0], 0.0, [0.0, 1.0])
    env = FakeNavEnv([ep])
    env.current_episode = ep
    env.reset()
    for _ in range(6):   # 6 * 15 = 90 degrees left
        env.step(2)
    for _ in range(4):
        env.step(1)
    env.step(0)
    assert env.get_metrics()["success"] == 1.0


def test_fake_env_observation_changes_with_pose():
    ep = FakeEpisode("0", "s/x/y.glb", "go", [0, 0], 0.0, [5.0, 0.0])
    env = FakeNavEnv([ep])
    env.current_episode = ep
    o1 = env.reset()
    o2 = env.step(1)
    assert not np.array_equal(o1["rgb"], o2["rgb"])


# -- full loop ----------------------------------------------------------

@pytest.fixture(scope="module")
def agent():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(256, 512, 768, 1024))
    return VLNAgent(engine, tok)


def test_episode_loop_and_resume(agent, tmp_path):
    episodes = make_episodes(4, seed=0)
    env = FakeNavEnv(episodes, max_episode_steps=6)
    ev = VLNEvaluator(env, agent, str(tmp_path), rank=0, world_size=1,
                      max_steps_per_episode=6)
    partial = ev.eval_action()
    assert len(partial["sucs"]) == 4
    final = ev.aggregate([partial])
    assert final["length"] == 4
    assert 0.0 <= final["sucs_all"] <= 1.0
    assert "ndtw_all" in final

    # resume: all episodes already recorded -> nothing re-run
    lines = open(os.path.join(tmp_path, "result.json")).read().splitlines()
    assert len(lines) == 5  # 4 episodes + aggregate line
    ev2 = VLNEvaluator(env, agent, str(tmp_path), rank=0, world_size=1,
                       max_steps_per_episode=6)
    partial2 = ev2.eval_action()
    # re-read from file, no new episodes run
    assert len(partial2["sucs"]) == 4


def test_rank_sharding(agent, tmp_path):
    episodes = make_episodes(5, seed=1, scenes=1)
    env = FakeNavEnv(episodes, max_episode_steps=4)
    p0 = VLNEvaluator(env, agent, str(tmp_path / "r0"), rank=0,
                      world_size=2, max_steps_per_episode=4).eval_action()
    p1 = VLNEvaluator(env, agent, str(tmp_path / "r1"), rank=1,
                      world_size=2, max_steps_per_episode=4).eval_action()
    assert len(p0["sucs"]) + len(p1["sucs"]) == 5
