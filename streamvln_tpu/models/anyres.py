"""AnyRes image path: tiled encode + unpad/newline merge, TPU-style.

The reference's anyres branch (llava/model/llava_arch.py:317-408,
"spatial_unpad" patch-merge) expands one <image> into a variable-length
token sequence: a 729-token global thumbnail followed by the tile grid
laid out spatially, cropped back to the image's aspect ratio
(unpad_image, llava_arch.py:127-157), with a learned `image_newline`
embedding appended to every grid row. Tiling host-side:
llava/mm_utils.py:243-295 (our utils/mm_utils.process_anyres_image).

TPU design: the token count is a pure function of (image size, grid
pinpoints), so the HOST computes it and bakes it into the splice layout
(build_splice_layout(image_token_counts=...)); the DEVICE merge is a
static-shape jit specialized per (grid, unpad) bucket — grids come from
a small pinpoint set, so the bucket count is bounded. StreamVLN's video
path never uses anyres (frames are square 384's); this covers the
inherited LLaVA single-image capability (offline VQA eval, co-training
single-image data).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import projector as projector_lib
from streamvln_tpu.models.siglip import forward as siglip_forward
from streamvln_tpu.ops.preprocess import preprocess_frames
from streamvln_tpu.utils.mm_utils import (get_anyres_image_grid_shape,
                                          process_anyres_image)

DEFAULT_GRID_PINPOINTS = ((384, 768), (768, 384), (768, 768),
                          (384, 1152), (1152, 384))


def unpad_bounds(grid_hw: Tuple[int, int], pps: int,
                 original_size: Tuple[int, int]
                 ) -> Tuple[int, int, int, int]:
    """(top, height, left, width) of the unpadded region of the
    [nph*pps, npw*pps] feature grid — the reference's unpad_image
    (llava_arch.py:138-157) on host ints so device shapes stay static.
    original_size is (width, height), matching the reference call."""
    nph, npw = grid_hw
    H, W = nph * pps, npw * pps
    ow, oh = original_size
    if ow / oh > W / H:
        # padding was added to the height
        new_h = int(oh * (W / ow))
        pad = (H - new_h) // 2
        return pad, H - 2 * pad, 0, W
    new_w = int(ow * (H / oh))
    pad = (W - new_w) // 2
    return 0, H, pad, W - 2 * pad


def anyres_token_count(original_size: Tuple[int, int], grid_pinpoints,
                       tile_size: int, pps: int) -> int:
    """Tokens one <image> expands to: thumbnail (pps^2) + unpadded grid
    rows each extended by the newline column (h * (w + 1))."""
    npw, nph = get_anyres_image_grid_shape(original_size, grid_pinpoints,
                                           tile_size)
    _, h, _, w = unpad_bounds((nph, npw), pps, original_size)
    return pps * pps + h * (w + 1)


def merge_anyres_features(feats: jax.Array,        # [n_tiles+1, P, D]
                          image_newline: jax.Array,  # [D]
                          grid_hw: Tuple[int, int],
                          pps: int,
                          original_size: Tuple[int, int]) -> jax.Array:
    """Device-side spatial_unpad merge (llava_arch.py:389-400):
    base thumbnail ++ (tile grid -> spatial layout -> unpad -> newline
    per row -> flatten). Returns [anyres_token_count, D]."""
    nph, npw = grid_hw
    D = feats.shape[-1]
    base = feats[0]
    tiles = feats[1:].reshape(nph, npw, pps, pps, D)
    # (nph, pps, npw, pps, D) -> [nph*pps, npw*pps, D] spatial grid
    grid = tiles.transpose(0, 2, 1, 3, 4).reshape(nph * pps, npw * pps, D)
    top, h, left, w = unpad_bounds(grid_hw, pps, original_size)
    region = jax.lax.slice(grid, (top, left, 0), (top + h, left + w, D))
    nl = jnp.broadcast_to(image_newline.astype(region.dtype), (h, 1, D))
    merged = jnp.concatenate([region, nl], axis=1).reshape(h * (w + 1), D)
    return jnp.concatenate([base, merged], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "grid_hw",
                                             "original_size",
                                             "attn_impl"))
def _encode_merge(params, cfg: StreamVLNConfig, tiles_u8: jax.Array,
                  grid_hw: Tuple[int, int],
                  original_size: Tuple[int, int],
                  attn_impl: str = "auto") -> jax.Array:
    pixels = preprocess_frames(tiles_u8, cfg.vision.image_size,
                               dtype=jnp.float32)
    feats = siglip_forward(params["vision"], cfg.vision, pixels,
                           attn_impl)          # [n+1, P, Dv] (no pool)
    feats = projector_lib.forward(params["projector"], feats)
    return merge_anyres_features(
        feats, params["image_newline"], grid_hw,
        cfg.vision.patches_per_side, original_size)


def encode_anyres(params, cfg: StreamVLNConfig, image_u8: np.ndarray,
                  grid_pinpoints=DEFAULT_GRID_PINPOINTS,
                  attn_impl: str = "auto") -> jax.Array:
    """Full anyres encode for one [H, W, 3] uint8 image ->
    [anyres_token_count, D_llm] features ready for splice_embeds.
    Requires params['image_newline'] (streamvln.init provides it; HF
    checkpoints map model.image_newline)."""
    ih, iw = image_u8.shape[:2]
    tile = cfg.vision.image_size
    tiles = process_anyres_image(image_u8, grid_pinpoints, tile)
    npw, nph = get_anyres_image_grid_shape((iw, ih), grid_pinpoints,
                                           tile)
    return _encode_merge(params, cfg, jnp.asarray(tiles), (nph, npw),
                         (iw, ih), attn_impl)


def generate_anyres(params, cfg: StreamVLNConfig, tok,
                    image_u8: np.ndarray, prompt_ids: np.ndarray,
                    max_new: int = 32,
                    stop_ids: Sequence[int] = (),
                    grid_pinpoints=DEFAULT_GRID_PINPOINTS,
                    attn_impl: str = "auto") -> list:
    """Single-image VQA generate over the anyres splice: prompt_ids may
    contain one <image> sentinel (-200), which expands to the image's
    anyres token count. Greedy decode with full recompute per token
    (offline-eval scale; the streaming engine covers the cached path
    for square video frames)."""
    from streamvln_tpu.models import qwen2, streamvln

    ih, iw = image_u8.shape[:2]
    n_tok = anyres_token_count((iw, ih), grid_pinpoints,
                               cfg.vision.image_size,
                               cfg.vision.patches_per_side)
    feats = encode_anyres(params, cfg, image_u8, grid_pinpoints,
                          attn_impl)
    ids = list(map(int, prompt_ids))
    stop = set(int(s) for s in stop_ids)
    out = []
    for _ in range(max_new):
        layout = streamvln.build_splice_layout(
            np.asarray(ids, np.int32), cfg,
            image_token_counts=[n_tok])
        batch = streamvln.stack_layouts([layout])
        embeds = streamvln.splice_embeds(
            params, feats[None], jnp.asarray(batch["token_ids"]),
            jnp.asarray(batch["is_vision"]),
            jnp.asarray(batch["vision_index"]), cfg.llm)
        pos = jnp.arange(layout.length)[None]
        logits, _ = qwen2.forward(params["llm"], cfg.llm, embeds, pos,
                                  attn_impl=attn_impl)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        ids.append(nxt)
        if nxt in stop:
            break
    return out
