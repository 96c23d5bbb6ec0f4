"""Multimodal image utilities: anyres tiling + stopping criteria.

Reference surface (llava/mm_utils.py): select_best_resolution (:119-151),
get_anyres_image_grid_shape (:213-242), process_anyres_image (:243-295),
tokenizer_image_token (:341-362 — our chatml module handles the sentinel
splice), KeywordsStoppingCriteria (:372-395 — our engine stops on token
ids; keyword-text stopping provided here for free-text generation).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions) -> Tuple[int, int]:
    """Pick the grid resolution maximizing effective resolution then
    minimizing waste (reference: mm_utils.py:119-151)."""
    ow, oh = original_size
    best, max_eff, min_waste = None, 0, float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (w, h)
    return best


def get_anyres_image_grid_shape(image_size: Tuple[int, int],
                                grid_pinpoints, patch_size: int
                                ) -> Tuple[int, int]:
    w, h = select_best_resolution(image_size, grid_pinpoints)
    return w // patch_size, h // patch_size


def divide_to_patches(image: np.ndarray, patch_size: int
                      ) -> List[np.ndarray]:
    """[H, W, 3] -> row-major list of [patch, patch, 3] tiles."""
    H, W = image.shape[:2]
    out = []
    for i in range(0, H, patch_size):
        for j in range(0, W, patch_size):
            out.append(image[i: i + patch_size, j: j + patch_size])
    return out


def process_anyres_image(image: np.ndarray, grid_pinpoints,
                         tile_size: int) -> np.ndarray:
    """AnyRes tiling: resize-with-pad to the best grid resolution, cut
    into tiles, prepend a global thumbnail (reference:
    mm_utils.py:243-295). Returns [n_tiles + 1, tile, tile, 3] uint8."""
    from PIL import Image
    ih, iw = image.shape[:2]
    best_w, best_h = select_best_resolution((iw, ih), grid_pinpoints)
    scale = min(best_w / iw, best_h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = np.asarray(Image.fromarray(image).resize(
        (nw, nh), Image.BICUBIC), np.uint8)
    canvas = np.zeros((best_h, best_w, 3), np.uint8)
    top, left = (best_h - nh) // 2, (best_w - nw) // 2
    canvas[top: top + nh, left: left + nw] = resized
    tiles = divide_to_patches(canvas, tile_size)
    thumb = np.asarray(Image.fromarray(image).resize(
        (tile_size, tile_size), Image.BICUBIC), np.uint8)
    return np.stack([thumb] + tiles)


class KeywordsStoppingCriteria:
    """Stop generation when any keyword appears in the decoded suffix
    (reference: mm_utils.py:372-395). Engine-side token stopping covers
    ChatML; this is for free-text keyword stops."""

    def __init__(self, keywords: Sequence[str], tokenizer):
        self.keywords = list(keywords)
        self.tok = tokenizer

    def should_stop(self, output_ids: Sequence[int],
                    lookback: int = 24) -> bool:
        text = self.tok.decode(list(output_ids)[-lookback:])
        return any(k in text for k in self.keywords)
