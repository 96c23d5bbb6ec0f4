"""Fused preprocess + patch-embed parity vs the two-stage path."""
import numpy as np
import jax
import jax.numpy as jnp

from streamvln_tpu.configs import SigLIPConfig, tiny_vision
from streamvln_tpu.models import siglip
from streamvln_tpu.ops.fused_patch_embed import (
    fold_normalize, fused_patch_embed, resize_matrix)
from streamvln_tpu.ops.preprocess import preprocess_frames


def test_resize_matrix_matches_jax_image():
    rng = np.random.RandomState(0)
    img = rng.rand(1, 48, 64, 3).astype(np.float32) * 255
    ref = jax.image.resize(jnp.asarray(img), (1, 32, 32, 3),
                           method="cubic")
    rh = jnp.asarray(resize_matrix(48, 32))
    rw = jnp.asarray(resize_matrix(64, 32))
    got = jnp.einsum("oh,nhwc->nowc", rh, jnp.asarray(img))
    got = jnp.einsum("pw,nowc->nopc", rw, got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-3)


def test_fold_normalize_algebra():
    rng = np.random.RandomState(1)
    x = rng.rand(5, 12).astype(np.float32) * 255
    w = rng.randn(12, 7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    ref = ((x / 255.0 - 0.5) / 0.5) @ w + b
    w2, b2 = fold_normalize(jnp.asarray(w), jnp.asarray(b))
    got = x @ np.asarray(w2) + np.asarray(b2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_fused_matches_two_stage():
    cfg = tiny_vision()
    params = siglip.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 255, (2, 48, 64, 3), np.uint8)

    pixels = preprocess_frames(jnp.asarray(frames), cfg.image_size,
                               jnp.float32)
    ref = siglip.forward(params, cfg, pixels, attn_impl="dense")
    got = siglip.forward_raw(params, cfg, jnp.asarray(frames),
                             attn_impl="dense",
                             compute_dtype=jnp.float32)
    assert got.shape == ref.shape
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() / denom < 0.02


def test_fused_so400m_shape():
    # real so400m geometry: 480x640 -> 384^2 -> 27x27 patches
    cfg = SigLIPConfig(hidden_size=32, intermediate_size=64,
                       num_layers=1, num_heads=4)
    params = siglip.init(jax.random.PRNGKey(1), cfg)
    frames = jnp.zeros((1, 480, 640, 3), jnp.uint8)
    out = fused_patch_embed(frames, params["patch_w"],
                            params["patch_b"],
                            image_size=cfg.image_size,
                            patch_size=cfg.patch_size,
                            compute_dtype=jnp.float32)
    assert out.shape == (1, 729, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_engine_fused_preprocess_smoke():
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine

    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024),
        fused_preprocess=True)
    agent = VLNAgent(engine, tok)
    rng = np.random.RandomState(0)
    for step in range(6):
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        a, _, _ = agent.step(0, frame, "walk to the door",
                             run_model=(step % 2 == 0))
        if step % 2 == 0:
            assert a is not None and len(a) >= 1


def test_preprocess_skips_resize_when_target_sized():
    from streamvln_tpu.ops.preprocess import preprocess_frames
    rng = np.random.RandomState(4)
    f = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    out = preprocess_frames(jnp.asarray(f), size=32, dtype=jnp.float32)
    want = (f.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                               atol=1e-6)


def test_engine_accepts_preresized_frames():
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine

    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)
    rng = np.random.RandomState(0)
    S = cfg.vision.image_size
    for step in range(4):
        frame = rng.randint(0, 255, (S, S, 3), np.uint8)  # pre-sized
        a, _, _ = agent.step(0, frame, "walk", run_model=(step % 2 == 0))
        if step % 2 == 0:
            assert a is not None
