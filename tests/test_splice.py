"""Static-shape splice layout vs a naive dynamic reference."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import qwen2, streamvln
from streamvln_tpu.utils.constants import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX)


def test_layout_expansion_counts():
    cfg = tiny_streamvln()
    tpf = cfg.tokens_per_frame  # 4
    mem = cfg.memory_tokens     # 2 * 4 = 8
    ids = np.array([5, MEMORY_TOKEN_INDEX, 6, IMAGE_TOKEN_INDEX, 7,
                    IMAGE_TOKEN_INDEX], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg)
    assert layout.length == 3 + mem + 2 * tpf  # 3 text tokens
    assert layout.is_vision.sum() == mem + 2 * tpf
    # memory tokens come first in the flat vision array
    np.testing.assert_array_equal(
        layout.vision_index[layout.is_vision][:mem], np.arange(mem))


def test_layout_vs_naive_splice():
    """Device splice == naive python concatenation of embeds."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tpf = cfg.tokens_per_frame
    D = cfg.llm.hidden_size
    V = 3
    vision_flat = jax.random.normal(jax.random.PRNGKey(1), (1, V * tpf, D))

    ids = np.array([11, IMAGE_TOKEN_INDEX, 12, 13, IMAGE_TOKEN_INDEX,
                    IMAGE_TOKEN_INDEX, 14], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, pad_to=32)
    batch = streamvln.stack_layouts([layout])
    embeds = streamvln.splice_embeds(
        params, vision_flat,
        jnp.asarray(batch["token_ids"]), jnp.asarray(batch["is_vision"]),
        jnp.asarray(batch["vision_index"]))

    # naive reference
    pieces = []
    cursor = 0
    for t in ids:
        if t == IMAGE_TOKEN_INDEX:
            pieces.append(np.asarray(vision_flat[0, cursor:cursor + tpf]))
            cursor += tpf
        else:
            emb = np.asarray(qwen2.embed_tokens(
                params["llm"], jnp.asarray([[t]])))[0]
            pieces.append(emb)
    ref = np.concatenate(pieces, 0)
    got = np.asarray(embeds[0, :layout.length])
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # pads are zero-embeds of token 0 — just check validity mask
    assert layout.valid[:layout.length].all()
    assert not layout.valid[layout.length:].any()


def test_frame_offset():
    cfg = tiny_streamvln()
    tpf = cfg.tokens_per_frame
    ids = np.array([IMAGE_TOKEN_INDEX], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, frame_offset=2)
    np.testing.assert_array_equal(
        layout.vision_index[:tpf], np.arange(2 * tpf, 3 * tpf))


def test_forward_train_loss_finite():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([1, IMAGE_TOKEN_INDEX, 2, 3, 4], np.int32)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 2, 3, 4], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, labels=labels,
                                           pad_to=16)
    batch = {k: jnp.asarray(v) for k, v in
             streamvln.stack_layouts([layout]).items()}
    imgs = jnp.zeros((1, 1, cfg.vision.image_size, cfg.vision.image_size, 3))
    loss, logits = streamvln.forward_train(params, cfg, imgs, batch)
    assert np.isfinite(float(loss))
    assert logits.shape[1] == 16
