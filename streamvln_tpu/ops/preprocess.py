"""Image preprocessing: resize-384 bicubic + rescale + normalize.

Parity target: the reference's SigLipImageProcessor
(reference: llava/model/multimodal_encoder/siglip_encoder.py:34-67):
PIL BICUBIC resize to 384x384, rescale by 1/255, normalize mean=std=0.5.

Two paths:
- `preprocess_frames`: jittable on-device version (jax.image cubic resize).
  This is the hot path for the streaming agent — frames go uint8 to the
  device and all arithmetic runs there, minimising host->device bytes
  (640*480*3 u8 vs 384*384*3 f32) and freeing host CPU for the simulator.
- `preprocess_frames_host`: numpy/PIL-exact version for dataset golden
  parity (PIL bicubic and jax cubic differ by ~1e-3 at edges).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_MEAN = 0.5
IMAGE_STD = 0.5
TARGET_SIZE = 384


@functools.partial(jax.jit, static_argnames=("size", "dtype"))
def preprocess_frames(frames_u8: jax.Array, size: int = TARGET_SIZE,
                      dtype=jnp.bfloat16) -> jax.Array:
    """[N, H, W, 3] uint8 -> [N, size, size, 3] normalized, on device.

    Already-target-sized input (e.g. host-side C++ resize,
    native/dataloader.cpp — the reference also resizes on host via
    SigLipImageProcessor) skips the device resize entirely; uploading
    384-squared uint8 halves the host->device bytes vs raw 480x640.
    """
    x = frames_u8.astype(jnp.float32)
    n = frames_u8.shape[0]
    if frames_u8.shape[1:3] != (size, size):
        x = jax.image.resize(x, (n, size, size, 3), method="cubic")
        # PIL clips bicubic overshoot back to the u8 range before
        # rescale (reference: SigLipImageProcessor resize on uint8)
        x = jnp.clip(x, 0.0, 255.0)
    x = x * (1.0 / 255.0)
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return x.astype(dtype)


def preprocess_frames_host(frames_u8: np.ndarray,
                           size: int = TARGET_SIZE) -> np.ndarray:
    """PIL-exact host path: [N, H, W, 3] uint8 -> [N, size, size, 3] f32."""
    from PIL import Image
    out = np.empty((frames_u8.shape[0], size, size, 3), np.float32)
    for i, frame in enumerate(frames_u8):
        img = Image.fromarray(frame).convert("RGB").resize(
            (size, size), Image.BICUBIC)
        out[i] = np.asarray(img, np.float32)
    out *= 1.0 / 255.0
    out -= IMAGE_MEAN
    out /= IMAGE_STD
    return out
