"""Visualization + save_video path."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.utils.visualize import (
    append_text_underneath_image, draw_top_down_map, images_to_video)


def test_top_down_map():
    path = [(0, 0), (1, 0), (1, 1), (2, 1)]
    img = draw_top_down_map(path, goal=(3, 2),
                            reference_path=np.linspace([0, 0], [3, 2], 4))
    assert img.shape == (512, 512, 3)
    # the drawing touched the canvas
    assert (img != 245).any()


def test_caption_strip():
    frame = np.zeros((40, 60, 3), np.uint8)
    out = append_text_underneath_image(frame, "step 3")
    assert out.shape == (64, 60, 3)
    assert (out[40:] != 0).any()   # white strip with text


def test_images_to_video(tmp_path):
    frames = [np.full((32, 32, 3), i * 10, np.uint8) for i in range(5)]
    path = images_to_video(frames, str(tmp_path), "ep0", fps=4)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_evaluator_save_video(tmp_path):
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.eval.evaluator import VLNEvaluator
    from streamvln_tpu.eval.fake_env import FakeNavEnv, make_episodes
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine

    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=1024, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)
    episodes = make_episodes(1, seed=0)
    env = FakeNavEnv(episodes, max_episode_steps=4,
                     rgb_shape=(48, 64, 3))
    ev = VLNEvaluator(env, agent, str(tmp_path), save_video=True,
                      max_steps_per_episode=4)
    ev.eval_action()
    vis = os.listdir(tmp_path / "vis_0")
    assert any(f.endswith((".gif", ".mp4")) for f in vis)
    assert any(f.endswith("_map.png") for f in vis)
