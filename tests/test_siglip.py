"""SigLIP tower tests: patchify vs torch conv, pooling vs torch
interpolate, end-to-end shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import tiny_streamvln, tiny_vision
from streamvln_tpu.models import siglip, streamvln


def test_patchify_matches_conv2d():
    import torch
    rng = np.random.RandomState(0)
    B, H, W, C, P = 2, 28, 28, 3, 14
    imgs = rng.randn(B, H, W, C).astype(np.float32)
    Dh = 8
    w = rng.randn(Dh, C, P, P).astype(np.float32)  # torch conv layout

    # ours: patchify + matmul with flattened (C, ph, pw) weight
    flat_w = w.reshape(Dh, C * P * P).T
    patches = siglip.patchify(jnp.asarray(imgs), P)
    ours = np.asarray(patches @ jnp.asarray(flat_w))

    conv = torch.nn.functional.conv2d(
        torch.tensor(imgs).permute(0, 3, 1, 2), torch.tensor(w), stride=P)
    ref = conv.flatten(2).transpose(1, 2).numpy()  # [B, N, Dh]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pool_2d_bilinear_matches_torch_interpolate():
    import torch
    rng = np.random.RandomState(1)
    N, side, D = 3, 27, 16
    feats = rng.randn(N, side * side, D).astype(np.float32)
    ours = streamvln.pool_2d(jnp.asarray(feats), side, 2, "bilinear")

    t = torch.tensor(feats).view(N, side, side, D).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        t, size=[14, 14], mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(N, 196, D).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_pool_2d_average():
    feats = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
    out = streamvln.pool_2d(feats, 4, 2, "average")
    np.testing.assert_allclose(
        np.asarray(out).squeeze(), [2.5, 4.5, 10.5, 12.5])


def test_tower_shapes():
    cfg = tiny_vision()
    params = siglip.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    out = siglip.forward(params, cfg, imgs)
    assert out.shape == (2, cfg.num_patches, cfg.hidden_size)


def test_encode_frames_shapes():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    B, V = 2, 3
    imgs = jnp.zeros((B, V, cfg.vision.image_size, cfg.vision.image_size, 3))
    feats = streamvln.encode_frames(params, cfg, imgs)
    assert feats.shape == (B, V * cfg.tokens_per_frame, cfg.llm.hidden_size)


def test_vision_int8_close_to_float():
    """int8 x int8 tower (quant.quantize_vision + the block's _scale
    dispatch) tracks the float forward: per-output-channel weight quant
    + per-token dynamic activation quant keeps relative error at the
    few-percent level through a deep encoder stack."""
    from streamvln_tpu.models import quant

    cfg = tiny_vision()
    params = siglip.init(jax.random.PRNGKey(5), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(6),
                              (2, cfg.image_size, cfg.image_size, 3))
    ref = np.asarray(siglip.forward(params, cfg, imgs))
    qparams = quant.quantize_vision(params)
    assert qparams["layers"]["q_w"].dtype == jnp.int8
    out = np.asarray(siglip.forward(qparams, cfg, imgs))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel
    # cosine similarity per token stays ~1
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.999, cos.min()
