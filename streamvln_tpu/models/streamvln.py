"""StreamVLN multimodal stack: SigLIP tower + projector + Qwen2, with
layout-driven token splicing.

Reference semantics (streamvln/model/stream_video_vln.py):
- encode_rgbd (:102-142): every frame -> vision tower (729 tok) ->
  mm_projector -> 2x2 pool -> 196 tok. History frames (slow memory) and
  current frames get the SAME computation; they differ only in which
  sentinel (<memory> vs <image>) their tokens replace. Depth/pose/intrinsic
  are plumbed through but unused by the released RGB-only path (:102-142;
  agent fakes them with zeros, streamvln_agent.py:171-174).
- prepare_inputs_labels_for_multimodal (:144-291): a dynamic python loop
  splicing variable-length vision features into the token sequence.

TPU-first redesign: the splice is STATIC-SHAPE. The host (data layer /
agent) precomputes a `SpliceLayout` — for each output position, whether it
is text or vision and the flat index into the per-sample vision-token
array. On device the splice is one gather + one select; under jit there is
no dynamic control flow and no recompilation across steps.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import projector as projector_lib
from streamvln_tpu.models import qwen2, siglip
from streamvln_tpu.utils.constants import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX)

Params = dict


def init(rng: jax.Array, cfg: StreamVLNConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "vision": siglip.init(k1, cfg.vision, dtype),
        "projector": projector_lib.init(
            k2, cfg.projector_type, cfg.vision.hidden_size,
            cfg.llm.hidden_size, dtype),
        "llm": qwen2.init(k3, cfg.llm, dtype),
        # learned row separator for the anyres spatial merge
        # (reference: llava_arch.py:109 image_newline, randn * embed_std)
        "image_newline": (jax.random.normal(
            k4, (cfg.llm.hidden_size,), dtype)
            * (cfg.llm.hidden_size ** -0.5)),
    }


# ---------------------------------------------------------------------------
# Vision encode: frames -> pooled LLM-space tokens
# ---------------------------------------------------------------------------

def pool_2d(feats: jax.Array, side: int, stride: int,
            mode: str = "bilinear") -> jax.Array:
    """[N, side*side, D] -> [N, ceil(side/stride)^2, D].

    Parity with get_2dPool (reference: stream_video_vln.py:53-73):
    'bilinear' = resize to ceil(side/stride) with half-pixel centers
    (torch interpolate align_corners=False), 'average'/'max' = strided pool.
    """
    N, _, D = feats.shape
    out_side = -(-side // stride)
    grid = feats.reshape(N, side, side, D)
    if mode == "bilinear":
        # antialias=False matches torch F.interpolate(mode='bilinear',
        # align_corners=False), which the reference uses.
        pooled = jax.image.resize(
            grid, (N, out_side, out_side, D), method="linear",
            antialias=False)
    elif mode in ("average", "max"):
        window = stride
        trimmed_side = (side // stride) * stride
        trimmed = grid[:, :trimmed_side, :trimmed_side]
        blocks = trimmed.reshape(
            N, side // stride, window, side // stride, window, D)
        pooled = (jnp.mean if mode == "average" else jnp.max)(
            blocks, axis=(2, 4))
        out_side = side // stride
    else:
        raise ValueError(mode)
    return pooled.reshape(N, out_side * out_side, D)


def encode_frames(params: Params, cfg: StreamVLNConfig,
                  images: jax.Array, attn_impl: str = "auto",
                  remat: bool = False) -> jax.Array:
    """[B, V, H, W, 3] -> [B, V * tokens_per_frame, llm_hidden].

    tower -> projector -> 2x2 pool, identical for memory and current frames
    (reference: stream_video_vln.py:111-141).
    """
    B, V = images.shape[:2]
    flat = images.reshape((B * V,) + images.shape[2:])
    feats = siglip.forward(params["vision"], cfg.vision, flat, attn_impl,
                           remat=remat)
    feats = projector_lib.forward(params["projector"], feats)
    feats = pool_2d(feats, cfg.vision.patches_per_side,
                    cfg.spatial_pool_stride, cfg.spatial_pool_mode)
    tpf = cfg.tokens_per_frame
    return feats.reshape(B, V * tpf, -1)


# ---------------------------------------------------------------------------
# Static-shape splice layout (host side, numpy)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SpliceLayout:
    """Expanded-sequence layout for one sample (host numpy).

    All arrays have length `padded_len`. Vision positions read
    `vision_flat[vision_index]`; text positions read `embed[token_ids]`.
    """
    token_ids: np.ndarray      # int32; pad positions = 0
    is_vision: np.ndarray      # bool
    vision_index: np.ndarray   # int32 into [V * tokens_per_frame]
    labels: np.ndarray         # int32; IGNORE_INDEX on vision/pad/user
    valid: np.ndarray          # bool; real (non-pad) positions
    length: int                # number of real positions


def build_splice_layout(
    input_ids: np.ndarray,
    cfg: StreamVLNConfig,
    labels: Optional[np.ndarray] = None,
    pad_to: Optional[int] = None,
    frame_offset: int = 0,
    max_frames: Optional[int] = None,
    image_token_counts: Optional[list] = None,
) -> SpliceLayout:
    """Expand sentinel ids into per-position layout.

    <image> (-200) expands to tokens_per_frame positions; <memory> (-300)
    expands to num_history * tokens_per_frame. Vision tokens are consumed
    in sentinel order: each sentinel takes the next frames from the flat
    per-sample vision array (memory first iff <memory> precedes the first
    <image>, which matches prompt construction). `frame_offset` shifts
    vision_index by whole frames (used by the streaming engine when the
    current call's image batch is only a suffix of the episode's frames).

    `image_token_counts`: per-<image> custom expansion widths, in
    sentinel order — the anyres path, where each image contributes a
    host-computed variable token count (thumbnail + unpadded tile grid
    + newline column; models/anyres.py; reference:
    llava/model/llava_arch.py:317-408).
    """
    input_ids = np.asarray(input_ids, np.int32)
    if labels is None:
        labels = np.full_like(input_ids, IGNORE_INDEX)
    tpf = cfg.tokens_per_frame
    mem_tokens = cfg.num_history * tpf

    out_ids, out_vis, out_vidx, out_labels = [], [], [], []
    vis_cursor = frame_offset * tpf
    img_i = 0
    for tok, lab in zip(input_ids.tolist(), labels.tolist()):
        if tok == IMAGE_TOKEN_INDEX:
            if image_token_counts is not None:
                n = int(image_token_counts[img_i])
                img_i += 1
            else:
                n = tpf
        elif tok == MEMORY_TOKEN_INDEX:
            n = mem_tokens
        else:
            out_ids.append(tok)
            out_vis.append(False)
            out_vidx.append(0)
            out_labels.append(lab)
            continue
        out_ids.extend([0] * n)
        out_vis.extend([True] * n)
        out_vidx.extend(range(vis_cursor, vis_cursor + n))
        out_labels.extend([IGNORE_INDEX] * n)
        vis_cursor += n

    if max_frames is not None and vis_cursor > max_frames * tpf:
        raise ValueError(
            f"layout consumes {vis_cursor // tpf} frames of vision tokens "
            f"but only {max_frames} frames are supplied (a mismatched "
            f"<image>/<memory> count would silently gather wrong features)")

    length = len(out_ids)
    if pad_to is None:
        pad_to = length
    if length > pad_to:
        raise ValueError(
            f"expanded sequence length {length} exceeds pad_to={pad_to}; "
            f"raise the padding bucket")
    pad = pad_to - length

    return SpliceLayout(
        token_ids=np.asarray(out_ids + [0] * pad, np.int32),
        is_vision=np.asarray(out_vis + [False] * pad, bool),
        vision_index=np.asarray(out_vidx + [0] * pad, np.int32),
        labels=np.asarray(out_labels + [IGNORE_INDEX] * pad, np.int32),
        valid=np.asarray([True] * length + [False] * pad, bool),
        length=length,
    )


def stack_layouts(layouts) -> dict:
    """List[SpliceLayout] -> dict of batched device-ready arrays."""
    return {
        "token_ids": np.stack([l.token_ids for l in layouts]),
        "is_vision": np.stack([l.is_vision for l in layouts]),
        "vision_index": np.stack([l.vision_index for l in layouts]),
        "labels": np.stack([l.labels for l in layouts]),
        "valid": np.stack([l.valid for l in layouts]),
        "lengths": np.asarray([l.length for l in layouts], np.int32),
    }


# ---------------------------------------------------------------------------
# Device-side splice + forward
# ---------------------------------------------------------------------------

def splice_embeds(params: Params, vision_flat: jax.Array,
                  token_ids: jax.Array, is_vision: jax.Array,
                  vision_index: jax.Array, llm_cfg=None) -> jax.Array:
    """Gather + select: [B, T] layout -> [B, T, llm_hidden]."""
    text = qwen2.embed_tokens(params["llm"], token_ids, llm_cfg)
    vis = jnp.take_along_axis(
        vision_flat, vision_index[:, :, None], axis=1)
    return jnp.where(is_vision[:, :, None], vis.astype(text.dtype), text)


def forward_train(
    params: Params,
    cfg: StreamVLNConfig,
    images: jax.Array,          # [B, V, H, W, 3]
    layout: dict,               # from stack_layouts
    attn_impl: str = "auto",
    remat: bool = False,
    loss_chunk_size: Optional[int] = None,
    remat_chunk: Optional[int] = None,
    mlp_chunk: Optional[int] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Training forward. Returns (loss, logits).

    loss_chunk_size: compute the cross-entropy in sequence chunks so the
    [B, T, vocab] logits tensor is never materialized — required for
    long contexts (the reference trains at ctx 32768, where full-seq
    150k-vocab logits would be ~19 GB/f32 per sample). Returns
    logits=None in chunked mode.
    """
    vision_flat = encode_frames(params, cfg, images, attn_impl,
                                remat=remat)
    embeds = splice_embeds(
        params, vision_flat, layout["token_ids"], layout["is_vision"],
        layout["vision_index"], cfg.llm)
    valid = layout["valid"]
    B, T = valid.shape
    positions = jnp.where(valid, jnp.cumsum(valid, axis=1) - 1, 0)
    labels = layout["labels"]

    if loss_chunk_size is None:
        logits, _ = qwen2.forward(
            params["llm"], cfg.llm, embeds, positions, valid=valid,
            attn_impl=attn_impl, remat=remat, remat_chunk=remat_chunk,
            mlp_chunk=mlp_chunk)
        loss = _ce_loss(logits[:, :-1], labels[:, 1:])
        return loss, logits

    hidden, _ = qwen2.forward(
        params["llm"], cfg.llm, embeds, positions, valid=valid,
        attn_impl=attn_impl, remat=remat, remat_chunk=remat_chunk,
        mlp_chunk=mlp_chunk, return_hidden=True)
    C = loss_chunk_size
    assert T % C == 0, (T, C)
    # shift: hidden[t] predicts labels[t+1]; pad labels so chunks align
    shifted_labels = jnp.concatenate(
        [labels[:, 1:],
         jnp.full((B, 1), IGNORE_INDEX, labels.dtype)], axis=1)
    hid_chunks = hidden.reshape(B, T // C, C, -1).transpose(1, 0, 2, 3)
    lab_chunks = shifted_labels.reshape(B, T // C, C).transpose(1, 0, 2)

    def chunk_loss(carry, xs):
        h, lab = xs
        logits = qwen2.lm_head_logits(params["llm"], h)
        mask = lab != IGNORE_INDEX
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = jnp.take_along_axis(
            logp, jnp.maximum(lab, 0)[..., None], axis=-1)[..., 0]
        s, n = carry
        return (s - jnp.sum(tok * mask), n + jnp.sum(mask)), None

    (loss_sum, count), _ = jax.lax.scan(
        jax.checkpoint(chunk_loss) if remat else chunk_loss,
        (jnp.float32(0), jnp.float32(0)), (hid_chunks, lab_chunks))
    loss = loss_sum / jnp.maximum(count, 1)
    return loss, None


def _ce_loss(shift_logits, shift_labels):
    mask = (shift_labels != IGNORE_INDEX)
    safe_labels = jnp.maximum(shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(
        logp, safe_labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(token_logp * mask) / jnp.maximum(jnp.sum(mask), 1)
