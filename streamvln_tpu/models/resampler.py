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


def qformer_resampler(num_latents: int = 32, hidden_size: int = 768,
                      num_layers: int = 12, num_heads: int = 12,
                      cross_attention_freq: int = 2,
                      intermediate_size: int = 3072):
    """BLIP-2-style Q-Former (reference:
    multimodal_resampler/qformer.py:1102-1160 — BERT-base query encoder
    with cross-attention to image features every `cross_attention_freq`
    layers and a separate query FFN; word/position embeddings and the
    text-branch FFN are removed).

    Input features keep their own width (`dim`, e.g. SigLIP 1152);
    output is [B, num_latents, hidden_size] (768) — downstream
    projectors must consume `hidden_size`, matching the reference's
    `Qformer.hidden_size` property.
    BERT layers are post-LN: x = LN(x + sublayer(x)).
    """
    from streamvln_tpu.ops.attention import dense_attention

    def init(rng, dim):
        H = hidden_size
        keys = jax.random.split(rng, 1 + num_layers)

        def dense(k, shape, fan):
            return jax.random.normal(k, shape) * (fan ** -0.5)

        def ln():
            return {"s": jnp.ones((H,)), "b": jnp.zeros((H,))}

        layers = []
        for i in range(num_layers):
            lk = jax.random.split(keys[1 + i], 10)
            layer = {
                "self": {
                    "q_w": dense(lk[0], (H, H), H),
                    "k_w": dense(lk[1], (H, H), H),
                    "v_w": dense(lk[2], (H, H), H),
                    "o_w": dense(lk[3], (H, H), H),
                    "ln": ln(),
                },
                "ffn": {
                    "w1": dense(lk[4], (H, intermediate_size), H),
                    "w2": dense(lk[5], (intermediate_size, H),
                                intermediate_size),
                    "ln": ln(),
                },
            }
            if i % cross_attention_freq == 0:
                layer["cross"] = {
                    "q_w": dense(lk[6], (H, H), H),
                    "k_w": dense(lk[7], (dim, H), dim),
                    "v_w": dense(lk[8], (dim, H), dim),
                    "o_w": dense(lk[9], (H, H), H),
                    "ln": ln(),
                }
            layers.append(layer)
        return {
            "queries": jax.random.normal(keys[0], (num_latents, H))
            * 0.02,
            "ln_vision_s": jnp.ones((dim,)),
            "ln_vision_b": jnp.zeros((dim,)),
            "layers": layers,
        }

    def _mha(p, q_in, kv_in, heads):
        B, M, H = q_in.shape
        Dh = H // heads
        q = jnp.dot(q_in, p["q_w"]).reshape(B, M, heads, Dh)
        k = jnp.dot(kv_in, p["k_w"]).reshape(B, -1, heads, Dh)
        v = jnp.dot(kv_in, p["v_w"]).reshape(B, -1, heads, Dh)
        o = dense_attention(q, k, v).reshape(B, M, H)
        return jnp.dot(o, p["o_w"])

    def apply(params, feats, rng=None, train=False):
        from streamvln_tpu.models.siglip import layer_norm
        B = feats.shape[0]
        x = layer_norm(feats, params["ln_vision_s"],
                       params["ln_vision_b"], 1e-12)
        h = jnp.broadcast_to(params["queries"][None],
                             (B, num_latents, hidden_size)
                             ).astype(feats.dtype)
        for p in params["layers"]:
            sa = p["self"]
            h = layer_norm(h + _mha(sa, h, h, num_heads), sa["ln"]["s"],
                           sa["ln"]["b"], 1e-12)
            if "cross" in p:
                ca = p["cross"]
                h = layer_norm(h + _mha(ca, h, x, num_heads),
                               ca["ln"]["s"], ca["ln"]["b"], 1e-12)
            ff = p["ffn"]
            y = jnp.dot(jax.nn.gelu(jnp.dot(h, ff["w1"])), ff["w2"])
            h = layer_norm(h + y, ff["ln"]["s"], ff["ln"]["b"], 1e-12)
        return h
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
    if name == "qformer":
        return qformer_resampler(**kwargs)
    raise ValueError(f"unknown resampler: {name}")
