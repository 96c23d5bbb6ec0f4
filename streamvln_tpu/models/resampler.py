"""Vision-token resamplers (reference zoo parity:
llava/model/multimodal_resampler/builder.py — masked_drop, spatial_pool,
perceiver, identity; the reference default and the StreamVLN path use
identity, with pooling handled downstream).

Functional: build(cfg) -> (init_fn, apply_fn). apply(params, feats
[B, N, D], *, rng=None, train=False) -> [B, M, D].
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def identity_resampler():
    def init(rng, dim):
        return {}

    def apply(params, feats, rng=None, train=False):
        return feats
    return init, apply


def masked_drop_resampler(ratio: float = 0.5):
    """Randomly drop tokens at train time (reference: masked_drop.py).
    Keeps ceil(N * (1-ratio)); eval keeps all tokens."""
    def init(rng, dim):
        return {}

    def apply(params, feats, rng=None, train=False):
        if not train or rng is None:
            return feats
        B, N, D = feats.shape
        keep = max(1, int(math.ceil(N * (1.0 - ratio))))
        noise = jax.random.uniform(rng, (B, N))
        idx = jnp.argsort(noise, axis=1)[:, :keep]
        idx = jnp.sort(idx, axis=1)
        return jnp.take_along_axis(feats, idx[..., None], axis=1)
    return init, apply


def spatial_pool_resampler(stride: int = 2, mode: str = "average"):
    """Strided 2D pooling over the token grid (reference:
    spatial_pool.py)."""
    def init(rng, dim):
        return {}

    def apply(params, feats, rng=None, train=False):
        B, N, D = feats.shape
        side = int(math.isqrt(N))
        assert side * side == N, f"{N} tokens is not a square grid"
        grid = feats.reshape(B, side, side, D)
        out_side = side // stride
        trimmed = grid[:, : out_side * stride, : out_side * stride]
        blocks = trimmed.reshape(B, out_side, stride, out_side, stride,
                                 D)
        red = jnp.mean if mode == "average" else jnp.max
        pooled = red(blocks, axis=(2, 4))
        return pooled.reshape(B, out_side * out_side, D)
    return init, apply


def perceiver_resampler(num_latents: int = 64, num_layers: int = 2,
                        num_heads: int = 8):
    """Latent cross-attention resampler (reference: perceiver.py —
    PerceiverResampler): learned latents attend over [latents; tokens]."""
    from streamvln_tpu.ops.attention import dense_attention

    def init(rng, dim):
        keys = jax.random.split(rng, 2 + num_layers * 6)
        def dense(k, shape, fan):
            return jax.random.normal(k, shape) * (fan ** -0.5)
        layers = []
        ki = 2
        for _ in range(num_layers):
            layers.append({
                "ln_s": jnp.ones((dim,)), "ln_b": jnp.zeros((dim,)),
                "q_w": dense(keys[ki], (dim, dim), dim),
                "kv_w": dense(keys[ki + 1], (dim, 2 * dim), dim),
                "o_w": dense(keys[ki + 2], (dim, dim), dim),
                "ff1": dense(keys[ki + 3], (dim, 4 * dim), dim),
                "ff2": dense(keys[ki + 4], (4 * dim, dim), 4 * dim),
            })
            ki += 6
        return {
            "latents": dense(keys[0], (num_latents, dim), dim),
            "layers": layers,
            "out_ln_s": jnp.ones((dim,)),
            "out_ln_b": jnp.zeros((dim,)),
        }

    def apply(params, feats, rng=None, train=False):
        from streamvln_tpu.models.siglip import layer_norm
        B, N, D = feats.shape
        Dh = D // num_heads
        lat = jnp.broadcast_to(params["latents"][None],
                               (B, num_latents, D)).astype(feats.dtype)
        for p in params["layers"]:
            h = layer_norm(lat, p["ln_s"], p["ln_b"], 1e-6)
            ctx = jnp.concatenate([feats, lat], axis=1)
            q = jnp.dot(h, p["q_w"]).reshape(B, num_latents, num_heads,
                                             Dh)
            kv = jnp.dot(ctx, p["kv_w"])
            kk, vv = jnp.split(kv, 2, axis=-1)
            kk = kk.reshape(B, -1, num_heads, Dh)
            vv = vv.reshape(B, -1, num_heads, Dh)
            attn = dense_attention(q, kk, vv)
            lat = lat + jnp.dot(attn.reshape(B, num_latents, D),
                                p["o_w"])
            h = layer_norm(lat, p["ln_s"], p["ln_b"], 1e-6)
            lat = lat + jnp.dot(jax.nn.gelu(jnp.dot(h, p["ff1"])),
                                p["ff2"])
        return layer_norm(lat, params["out_ln_s"], params["out_ln_b"],
                          1e-6)
    return init, apply


def build_resampler(name: Optional[str], **kwargs):
    """Dispatch matching the reference builder
    (multimodal_resampler/builder.py:21-34)."""
    if name in (None, "identity", "none"):
        return identity_resampler()
    if name == "masked_drop":
        return masked_drop_resampler(**kwargs)
    if name == "spatial_pool":
        return spatial_pool_resampler(**kwargs)
    if name == "perceiver":
        return perceiver_resampler(**kwargs)
    raise ValueError(f"unknown resampler: {name}")
