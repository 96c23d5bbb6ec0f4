"""SigLIP vision tower (so400m-patch14-384), functional JAX.

Behavioral parity with the reference tower
(reference: llava/model/multimodal_encoder/siglip_encoder.py):
- patch embed = 14x14 valid conv + learned position embeddings (729 pos)
- pre-LN transformer blocks, gelu-tanh MLP
- the checkpoint's LAST encoder layer and pooling head are dropped
  (siglip_encoder.py:570-571); features are the remaining stack's output
  WITHOUT the final post_layernorm (forward takes hidden_states[-1],
  siglip_encoder.py:586), always 729 patch tokens.

TPU notes: the patch conv is expressed as a reshape + single [B*729, 588]
x [588, 1152] matmul (maps straight onto the MXU; XLA fuses the bias).
Layers are stacked and scanned like the LLM.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from streamvln_tpu.configs import SigLIPConfig
from streamvln_tpu.ops.attention import mha_attention

Params = dict


def layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def init(rng: jax.Array, cfg: SigLIPConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 12)
    L, D, F, H = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, \
        cfg.num_heads
    P = cfg.patch_size
    N = cfg.num_patches

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    return {
        "patch_w": dense(keys[0], (P * P * 3, D), P * P * 3),
        "patch_b": jnp.zeros((D,), dtype),
        "pos_embed": dense(keys[1], (N, D), D),
        "layers": {
            "ln1_s": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "q_w": dense(keys[2], (L, D, D), D),
            "q_b": jnp.zeros((L, D), dtype),
            "k_w": dense(keys[3], (L, D, D), D),
            "k_b": jnp.zeros((L, D), dtype),
            "v_w": dense(keys[4], (L, D, D), D),
            "v_b": jnp.zeros((L, D), dtype),
            "o_w": dense(keys[5], (L, D, D), D),
            "o_b": jnp.zeros((L, D), dtype),
            "ln2_s": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "fc1_w": dense(keys[6], (L, D, F), D),
            "fc1_b": jnp.zeros((L, F), dtype),
            "fc2_w": dense(keys[7], (L, F, D), F),
            "fc2_b": jnp.zeros((L, D), dtype),
        },
    }


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, patch*patch*3], row-major patches.

    Flattening order matches a torch Conv2d(stride=patch) + flatten(2):
    channel-major within the patch (c, ph, pw) to stay weight-compatible
    with HF checkpoints after conversion.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    # valid conv semantics: trailing pixels that don't fill a patch are
    # discarded (so400m: 384 = 27*14 + 6; torch Conv2d stride=14 ignores
    # the last 6 rows/cols)
    x = images[:, : gh * patch, : gw * patch]
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B, gh, gw, C, ph, pw]
    return x.reshape(B, gh * gw, C * patch * patch)


def forward(params: Params, cfg: SigLIPConfig, images: jax.Array,
            attn_impl: str = "auto", remat: bool = False) -> jax.Array:
    """images: [B, H, W, 3] preprocessed pixels -> [B, 729, hidden]."""
    x = patchify(images, cfg.patch_size)
    x = (jnp.dot(x, params["patch_w"], preferred_element_type=jnp.float32)
         + params["patch_b"].astype(jnp.float32)).astype(images.dtype)
    return forward_embeddings(params, cfg, x, attn_impl=attn_impl,
                              remat=remat)


def forward_raw(params: Params, cfg: SigLIPConfig, frames_u8: jax.Array,
                attn_impl: str = "auto", remat: bool = False,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """Raw [B, H, W, 3] uint8 frames -> [B, 729, hidden] via the fused
    resize/normalize/patch-embed path (ops/fused_patch_embed.py)."""
    from streamvln_tpu.ops.fused_patch_embed import fused_patch_embed
    x = fused_patch_embed(frames_u8, params["patch_w"],
                          params["patch_b"],
                          image_size=cfg.image_size,
                          patch_size=cfg.patch_size,
                          compute_dtype=compute_dtype)
    return forward_embeddings(params, cfg, x, attn_impl=attn_impl,
                              remat=remat)


def forward_embeddings(params: Params, cfg: SigLIPConfig,
                       embeds: jax.Array, attn_impl: str = "auto",
                       remat: bool = False) -> jax.Array:
    """Patch embeddings [B, N, hidden] -> encoder output."""
    B = embeds.shape[0]
    x = embeds + params["pos_embed"].astype(embeds.dtype)[None]

    H, Dh = cfg.num_heads, cfg.head_dim
    N = cfg.num_patches

    def dense(h, p, name):
        """One tower projection. int8-quantized towers (models/quant.py
        quantize_vision) carry `<name>_w_scale` satellites and run as
        int8 x int8 MXU dots with per-token dynamic activation quant —
        2x the bf16 MXU rate on the compute-bound encoder."""
        if name + "_w_scale" in p:
            from streamvln_tpu.models.quant import int8_dynamic_matmul
            out = int8_dynamic_matmul(h, p[name + "_w"],
                                      p[name + "_w_scale"])
            return out.astype(h.dtype) + p[name + "_b"]
        return jnp.dot(h, p[name + "_w"]) + p[name + "_b"]

    def block(x, p):
        in_dtype = x.dtype
        h = layer_norm(x, p["ln1_s"], p["ln1_b"], cfg.layer_norm_eps)
        # q/k/v stay three separate dots: fusing them into one
        # [D, 3D] matmul measured SLOWER at encoder shapes (see
        # models/fuse.py docstring — the fused variant materializes
        # the [B, S, 3D] intermediate; these dots are compute-bound)
        q = dense(h, p, "q").reshape(B, N, H, Dh)
        k = dense(h, p, "k").reshape(B, N, H, Dh)
        v = dense(h, p, "v").reshape(B, N, H, Dh)
        attn = mha_attention(q, k, v, impl=attn_impl)
        attn = attn.reshape(B, N, H * Dh)
        x = x + dense(attn, p, "o")
        h = layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(h, p, "fc1"), approximate=True)
        x = x + dense(h, p, "fc2")
        # mixed precision (bf16 activations over f32 params) must not
        # drift the scan carry dtype
        return x.astype(in_dtype), None

    block_fn = jax.checkpoint(block) if remat else block
    x, _ = jax.lax.scan(block_fn, x, params["layers"])
    return x
