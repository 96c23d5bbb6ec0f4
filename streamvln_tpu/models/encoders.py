"""Vision-encoder zoo: CLIP / OpenCLIP / MLCD(2D-RoPE) towers + S2
multi-scale wrapper + name-dispatch builder.

Reference surface: llava/model/multimodal_encoder/builder.py:13-42
(dispatch on tower name), clip_encoder.py (CLIPVisionTower +
feature_select semantics), open_clip_encoder.py, mlcd/vit_rope2d_hf.py
(MLCD ViT-bigG with 2D rotary attention). The SigLIP tower (the one
StreamVLN ships with) lives in models/siglip.py; this module covers the
alternates so `build_vision_tower` has full registry breadth.

Functional JAX, one stacked-layer pytree scanned like the LLM; patch
embed is a single MXU matmul (reshape + [B*N, P*P*3] x [P*P*3, D]).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from streamvln_tpu.ops.attention import mha_attention
from streamvln_tpu.models.siglip import layer_norm, patchify

Params = dict


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP-family ViT config (covers OpenAI CLIP, OpenCLIP, MLCD).

    `select_layer` follows the reference's hidden_states indexing
    (clip_encoder.py:58): -2 = output of the penultimate block. Only
    the blocks actually needed are run.
    """
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"   # OpenAI CLIP; "gelu" for OpenCLIP
    rope2d: bool = False             # MLCD vit_rope2d towers
    select_layer: int = -2
    select_feature: str = "patch"    # "patch" | "cls_patch"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def feature_dim(self) -> int:
        return self.hidden_size


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation: {name}")


def init(rng: jax.Array, cfg: ClipVisionConfig,
         dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 12)
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P, N = cfg.patch_size, cfg.num_patches

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    params = {
        # CLIP patch conv has no bias (CLIPVisionEmbeddings)
        "patch_w": dense(keys[0], (P * P * 3, D), P * P * 3),
        "cls_embed": dense(keys[1], (D,), D),
        "pre_ln_s": jnp.ones((D,), dtype),
        "pre_ln_b": jnp.zeros((D,), dtype),
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
    if cfg.rope2d:
        # learned class-token rotary phase (vit_rope2d_hf.py:287)
        params["class_pos_emb"] = dense(keys[8], (cfg.head_dim // 2,),
                                        cfg.head_dim // 2)
    else:
        params["pos_embed"] = dense(keys[8], (N + 1, D), D)
    return params


def _rope2d_freqs(cfg: ClipVisionConfig,
                  class_pos_emb: jax.Array) -> jax.Array:
    """Per-token rotary phase [N+1, head_dim/2] over the 2D patch grid
    (vit_rope2d_hf.py:290-307: h-freqs and w-freqs interleave the
    head_dim/4 inverse-frequency bank; class token uses a learned
    phase)."""
    dim = cfg.head_dim // 2          # rotary bank width
    g = cfg.grid
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2,
                                             dtype=jnp.float32) / dim))
    hpos = jnp.repeat(jnp.arange(g, dtype=jnp.float32), g)    # row-major
    wpos = jnp.tile(jnp.arange(g, dtype=jnp.float32), g)
    hf = hpos[:, None] * inv_freq[None]          # [N, dim/2]
    wf = wpos[:, None] * inv_freq[None]
    freqs = jnp.concatenate([hf, wf], axis=-1)   # [N, dim]
    return jnp.concatenate([class_pos_emb.astype(jnp.float32)[None],
                            freqs], axis=0)      # [N+1, dim]


def _apply_rope2d(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: [B, N, H, Dh]; freqs: [N, Dh/2] (cos/sin duplicated over the
    two halves, rotate-half convention — vit_rope2d_hf.py:19-28)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    cos = jnp.concatenate([cos, cos], axis=-1)[None, :, None, :]
    sin = jnp.concatenate([sin, sin], axis=-1)[None, :, None, :]
    half = xf.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * cos + rot * sin).astype(orig)


def forward(params: Params, cfg: ClipVisionConfig, images: jax.Array,
            attn_impl: str = "auto", remat: bool = False) -> jax.Array:
    """images: [B, H, W, 3] preprocessed pixels -> selected features
    ([B, N, D] for "patch", [B, N+1, D] for "cls_patch")."""
    B = images.shape[0]
    x = patchify(images, cfg.patch_size)
    x = jnp.dot(x, params["patch_w"],
                preferred_element_type=jnp.float32).astype(images.dtype)
    cls = jnp.broadcast_to(params["cls_embed"].astype(x.dtype)[None,
                                                              None],
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)        # [B, N+1, D]
    if "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_ln_s"], params["pre_ln_b"],
                   cfg.layer_norm_eps)

    freqs = None
    if cfg.rope2d:
        freqs = _rope2d_freqs(cfg, params["class_pos_emb"])

    H, Dh = cfg.num_heads, cfg.head_dim
    N1 = cfg.num_patches + 1
    act = _act(cfg.hidden_act)

    def block(x, p):
        in_dtype = x.dtype
        h = layer_norm(x, p["ln1_s"], p["ln1_b"], cfg.layer_norm_eps)
        q = (jnp.dot(h, p["q_w"]) + p["q_b"]).reshape(B, N1, H, Dh)
        k = (jnp.dot(h, p["k_w"]) + p["k_b"]).reshape(B, N1, H, Dh)
        v = (jnp.dot(h, p["v_w"]) + p["v_b"]).reshape(B, N1, H, Dh)
        if freqs is not None:
            q = _apply_rope2d(q, freqs)
            k = _apply_rope2d(k, freqs)
        attn = mha_attention(q, k, v, impl=attn_impl)
        x = x + jnp.dot(attn.reshape(B, N1, H * Dh), p["o_w"]) \
            + p["o_b"]
        h = layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.layer_norm_eps)
        h = act(jnp.dot(h, p["fc1_w"]) + p["fc1_b"])
        x = x + jnp.dot(h, p["fc2_w"]) + p["fc2_b"]
        return x.astype(in_dtype), None

    # select_layer=-2 means "hidden state entering the last block"
    # (HF hidden_states[-2]) — run only the blocks that feed it
    n_run = cfg.num_layers + cfg.select_layer + 1
    assert 0 < n_run <= cfg.num_layers, (cfg.select_layer,
                                         cfg.num_layers)
    layers = jax.tree_util.tree_map(lambda a: a[:n_run],
                                    params["layers"])
    block_fn = jax.checkpoint(block) if remat else block
    x, _ = jax.lax.scan(block_fn, x, layers)

    if cfg.select_feature == "patch":
        return x[:, 1:]
    if cfg.select_feature == "cls_patch":
        return x
    raise ValueError(f"unknown select_feature: {cfg.select_feature}")


# ---------------------------------------------------------------------------
# EVA-CLIP towers (reference: multimodal_encoder/eva_clip/eva_vit.py —
# EVAVisionTransformer + EVAEncoderWrapper). The wrapper runs
# forward_features(return_all_features=True): the LAST block is skipped
# (eva_vit.py:692-693), no final norm is applied, and the cls token is
# dropped (:846). Families: EVA01 (fused qkv + q/v bias, plain gelu
# MLP), EVA02 (subln split q/k/v + inner attn LN, naive SwiGLU with
# ffn_ln, interleaved 2D rope with interpolated frequencies). The
# EVA-CLIP-8B/18B configs pass `use_rms_norm`, which the reference's own
# CLIPVisionCfg dataclass rejects (eva_vit.py:767-793) — they cannot be
# constructed there either, so they are out of scope here.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EvaVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 2730     # int(width * mlp_ratio)
    num_layers: int = 24              # reference depth; last block is
    # built but skipped at inference (eva_vit.py:692-693)
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True             # q/v bias, k zero (eva_vit.py:261)
    subln: bool = False               # split q/k/v + inner_attn_ln +
    # ffn_ln (sub-LayerNorm, EVA02)
    swiglu: bool = False              # naiveswiglu MLP (EVA02)
    rope2d: bool = False              # interleaved 2D rotary (EVA02)
    pt_hw_seq_len: int = 16           # rope pretrain grid
    intp_freq: bool = False           # interpolate rope to ft grid
    postnorm: bool = False
    layer_scale: bool = False         # ls_init_value (gamma_1/2)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def feature_dim(self) -> int:
        return self.hidden_size


def eva_init(rng: jax.Array, cfg: EvaVisionConfig,
             dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 16)
    L = cfg.num_layers - 1     # the skipped last block holds no params
    D, F, P = cfg.hidden_size, cfg.intermediate_size, cfg.patch_size

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    layers = {
        "ln1_s": jnp.ones((L, D), dtype),
        "ln1_b": jnp.zeros((L, D), dtype),
        "q_w": dense(keys[2], (L, D, D), D),
        "k_w": dense(keys[3], (L, D, D), D),
        "v_w": dense(keys[4], (L, D, D), D),
        "q_b": jnp.zeros((L, D), dtype),
        "v_b": jnp.zeros((L, D), dtype),
        "o_w": dense(keys[5], (L, D, D), D),
        "o_b": jnp.zeros((L, D), dtype),
        "ln2_s": jnp.ones((L, D), dtype),
        "ln2_b": jnp.zeros((L, D), dtype),
    }
    if cfg.subln:
        layers.update({"attn_ln_s": jnp.ones((L, D), dtype),
                       "attn_ln_b": jnp.zeros((L, D), dtype)})
    if cfg.swiglu:
        layers.update({
            "w1_w": dense(keys[6], (L, D, F), D),
            "w1_b": jnp.zeros((L, F), dtype),
            "w2_w": dense(keys[7], (L, D, F), D),
            "w2_b": jnp.zeros((L, F), dtype),
            "w3_w": dense(keys[8], (L, F, D), F),
            "w3_b": jnp.zeros((L, D), dtype),
        })
    else:
        layers.update({
            "fc1_w": dense(keys[6], (L, D, F), D),
            "fc1_b": jnp.zeros((L, F), dtype),
            "fc2_w": dense(keys[7], (L, F, D), F),
            "fc2_b": jnp.zeros((L, D), dtype),
        })
    if cfg.subln:
        layers.update({"ffn_ln_s": jnp.ones((L, F), dtype),
                       "ffn_ln_b": jnp.zeros((L, F), dtype)})
    if cfg.layer_scale:
        layers.update({"gamma_1": jnp.ones((L, D), dtype),
                       "gamma_2": jnp.ones((L, D), dtype)})
    return {
        # EVA PatchEmbed conv carries a bias (eva_vit.py:446-460)
        "patch_w": dense(keys[0], (P * P * 3, D), P * P * 3),
        "patch_b": jnp.zeros((D,), dtype),
        "cls_embed": dense(keys[1], (D,), D),
        "pos_embed": dense(keys[9], (cfg.num_patches + 1, D), D),
        "layers": layers,
    }


def _eva_rope_freqs(cfg: EvaVisionConfig) -> jax.Array:
    """Interleaved 2D rotary phases [N, head_dim] for the patch tokens
    (VisionRotaryEmbeddingFast, eva_vit.py:37-67): a head_dim/4
    inverse-frequency bank, each frequency duplicated onto adjacent
    pairs, rows phases in the first head_dim/2 lanes and column phases
    in the second; intp_freq rescales positions onto the pretrain
    grid."""
    dim = cfg.head_dim // 2
    g = cfg.grid
    inv = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2,
                                        dtype=jnp.float32) / dim))
    if cfg.intp_freq:
        t = jnp.arange(g, dtype=jnp.float32) / g * cfg.pt_hw_seq_len
    else:
        t = jnp.arange(g, dtype=jnp.float32)
    f1 = t[:, None] * inv[None]                     # [g, dim/2]
    f1 = jnp.repeat(f1, 2, axis=-1)                 # (n r) r=2 pairs
    rows = jnp.repeat(f1, g, axis=0)                # row-major grid
    cols = jnp.tile(f1, (g, 1))
    return jnp.concatenate([rows, cols], axis=-1)   # [N, head_dim]


def _rotate_pairs(x: jax.Array) -> jax.Array:
    """EVA rotate_half: adjacent pairs (x1, x2) -> (-x2, x1)
    (eva_vit.py:30-35)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_eva_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: [B, N, H, Dh] patch tokens (no cls); freqs: [N, Dh]."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    return (xf * cos + _rotate_pairs(xf) * sin).astype(orig)


def eva_forward(params: Params, cfg: EvaVisionConfig, images: jax.Array,
                attn_impl: str = "auto",
                remat: bool = False) -> jax.Array:
    """images: [B, H, W, 3] -> [B, N, D] patch features (cls dropped,
    no final norm — EVAEncoderWrapper semantics, eva_vit.py:839-846)."""
    B = images.shape[0]
    x = patchify(images, cfg.patch_size)
    x = (jnp.dot(x, params["patch_w"],
                 preferred_element_type=jnp.float32)
         .astype(images.dtype)) + params["patch_b"].astype(images.dtype)
    cls = jnp.broadcast_to(
        params["cls_embed"].astype(x.dtype)[None, None],
        (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    freqs = _eva_rope_freqs(cfg) if cfg.rope2d else None
    H, Dh = cfg.num_heads, cfg.head_dim
    N1 = cfg.num_patches + 1
    eps = cfg.layer_norm_eps

    def attn_fn(h, p):
        q = jnp.dot(h, p["q_w"]) + p["q_b"]
        k = jnp.dot(h, p["k_w"])          # k has no bias
        v = jnp.dot(h, p["v_w"]) + p["v_b"]
        q = q.reshape(B, N1, H, Dh)
        k = k.reshape(B, N1, H, Dh)
        v = v.reshape(B, N1, H, Dh)
        if freqs is not None:             # rope skips the cls token
            q = q.at[:, 1:].set(_apply_eva_rope(q[:, 1:], freqs))
            k = k.at[:, 1:].set(_apply_eva_rope(k[:, 1:], freqs))
        a = mha_attention(q, k, v, impl=attn_impl)
        a = a.reshape(B, N1, H * Dh)
        if cfg.subln:
            a = layer_norm(a, p["attn_ln_s"], p["attn_ln_b"], eps)
        return jnp.dot(a, p["o_w"]) + p["o_b"]

    def mlp_fn(h, p):
        if cfg.swiglu:
            x1 = jnp.dot(h, p["w1_w"]) + p["w1_b"]
            x2 = jnp.dot(h, p["w2_w"]) + p["w2_b"]
            hid = jax.nn.silu(x1.astype(jnp.float32)).astype(h.dtype) \
                * x2
            if cfg.subln:
                hid = layer_norm(hid, p["ffn_ln_s"], p["ffn_ln_b"], eps)
            return jnp.dot(hid, p["w3_w"]) + p["w3_b"]
        hid = jax.nn.gelu(
            (jnp.dot(h, p["fc1_w"]) + p["fc1_b"]).astype(jnp.float32),
            approximate=False).astype(h.dtype)
        if cfg.subln:
            hid = layer_norm(hid, p["ffn_ln_s"], p["ffn_ln_b"], eps)
        return jnp.dot(hid, p["fc2_w"]) + p["fc2_b"]

    def block(x, p):
        in_dtype = x.dtype
        g1 = p["gamma_1"] if cfg.layer_scale else None
        g2 = p["gamma_2"] if cfg.layer_scale else None
        if cfg.postnorm:
            a = layer_norm(attn_fn(x, p), p["ln1_s"], p["ln1_b"], eps)
            x = x + (a * g1 if g1 is not None else a)
            m = layer_norm(mlp_fn(x, p), p["ln2_s"], p["ln2_b"], eps)
            x = x + (m * g2 if g2 is not None else m)
        else:
            a = attn_fn(layer_norm(x, p["ln1_s"], p["ln1_b"], eps), p)
            x = x + (a * g1 if g1 is not None else a)
            m = mlp_fn(layer_norm(x, p["ln2_s"], p["ln2_b"], eps), p)
            x = x + (m * g2 if g2 is not None else m)
        return x.astype(in_dtype), None

    block_fn = jax.checkpoint(block) if remat else block
    x, _ = jax.lax.scan(block_fn, x, params["layers"])
    return x[:, 1:]                       # drop cls; no final norm


def convert_eva_tower(state_dict, cfg: EvaVisionConfig,
                      dtype=jnp.float32) -> Params:
    """Map an EVA-CLIP visual state dict (visual.* keys stripped, the
    reference's load_clip_visual_state_dict convention) onto our
    stacked layout. Only the first num_layers-1 blocks are mapped — the
    last is skipped at inference and carries no learnable effect."""
    import numpy as np

    def t(name):
        a = state_dict[name]
        if hasattr(a, "detach"):
            a = a.detach().cpu().numpy()
        return np.asarray(a, np.float32)

    D = cfg.hidden_size
    conv = t("patch_embed.proj.weight")          # [D, 3, P, P]
    out = {
        "patch_w": jnp.asarray(conv.reshape(D, -1).T, dtype),
        "patch_b": jnp.asarray(t("patch_embed.proj.bias"), dtype),
        "cls_embed": jnp.asarray(t("cls_token").reshape(-1), dtype),
        "pos_embed": jnp.asarray(t("pos_embed")[0], dtype),
    }
    stack: dict = {}

    def put(k, v):
        stack.setdefault(k, []).append(v)

    for i in range(cfg.num_layers - 1):
        b = f"blocks.{i}."
        put("ln1_s", t(b + "norm1.weight"))
        put("ln1_b", t(b + "norm1.bias"))
        if cfg.subln:
            put("q_w", t(b + "attn.q_proj.weight").T)
            put("k_w", t(b + "attn.k_proj.weight").T)
            put("v_w", t(b + "attn.v_proj.weight").T)
            put("attn_ln_s", t(b + "attn.inner_attn_ln.weight"))
            put("attn_ln_b", t(b + "attn.inner_attn_ln.bias"))
        else:
            qkv = t(b + "attn.qkv.weight")       # [3D, D]
            put("q_w", qkv[:D].T)
            put("k_w", qkv[D:2 * D].T)
            put("v_w", qkv[2 * D:].T)
        put("q_b", t(b + "attn.q_bias"))
        put("v_b", t(b + "attn.v_bias"))
        put("o_w", t(b + "attn.proj.weight").T)
        put("o_b", t(b + "attn.proj.bias"))
        put("ln2_s", t(b + "norm2.weight"))
        put("ln2_b", t(b + "norm2.bias"))
        if cfg.swiglu:
            put("w1_w", t(b + "mlp.w1.weight").T)
            put("w1_b", t(b + "mlp.w1.bias"))
            put("w2_w", t(b + "mlp.w2.weight").T)
            put("w2_b", t(b + "mlp.w2.bias"))
            put("w3_w", t(b + "mlp.w3.weight").T)
            put("w3_b", t(b + "mlp.w3.bias"))
        else:
            put("fc1_w", t(b + "mlp.fc1.weight").T)
            put("fc1_b", t(b + "mlp.fc1.bias"))
            put("fc2_w", t(b + "mlp.fc2.weight").T)
            put("fc2_b", t(b + "mlp.fc2.bias"))
        if cfg.subln:
            put("ffn_ln_s", t(b + "mlp.ffn_ln.weight"))
            put("ffn_ln_b", t(b + "mlp.ffn_ln.bias"))
        if cfg.layer_scale:
            put("gamma_1", t(b + "gamma_1"))
            put("gamma_2", t(b + "gamma_2"))
    out["layers"] = {k: jnp.asarray(np.stack(v), dtype)
                     for k, v in stack.items()}
    return out


# ---------------------------------------------------------------------------
# S2 multi-scale wrapper (reference: CLIPVisionTowerS2 /
# MLCDVisionTowerS2 via the s2wrapper package — split each scale into
# base-size crops, forward, merge grids, pool to base grid, concat
# channels)
# ---------------------------------------------------------------------------

def s2_forward(forward_fn, images: jax.Array, base_size: int,
               scales: Sequence[int]) -> jax.Array:
    """images: [B, base, base, 3] -> [B, N_base, D * len(scales)].

    For each scale s = k*base: bilinear-resize the image to s, split
    into k^2 base-size crops, run the tower on all crops in one batch,
    reassemble the k*g x k*g feature grid, average-pool back to g x g,
    and concatenate features across scales channel-wise.
    """
    B = images.shape[0]
    outs = []
    for s in scales:
        k = s // base_size
        assert k * base_size == s, (s, base_size)
        if k == 1:
            feats = forward_fn(images)           # [B, g*g, D]
            outs.append(feats)
            continue
        big = jax.image.resize(images, (B, s, s, images.shape[-1]),
                               method="bilinear")
        crops = big.reshape(B, k, base_size, k, base_size, -1)
        crops = crops.transpose(0, 1, 3, 2, 4, 5).reshape(
            B * k * k, base_size, base_size, -1)
        feats = forward_fn(crops)                # [B*k*k, g*g, D]
        g = int(math.isqrt(feats.shape[1]))
        D = feats.shape[-1]
        grid = feats.reshape(B, k, k, g, g, D)
        grid = grid.transpose(0, 1, 3, 2, 4, 5).reshape(B, k * g,
                                                        k * g, D)
        pooled = grid.reshape(B, g, k, g, k, D).mean(axis=(2, 4))
        outs.append(pooled.reshape(B, g * g, D))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Builder (reference: multimodal_encoder/builder.py:13-42)
# ---------------------------------------------------------------------------

_PRESETS = {
    "openai/clip-vit-large-patch14": ClipVisionConfig(image_size=224),
    "openai/clip-vit-large-patch14-336": ClipVisionConfig(
        image_size=336),
    "laion/CLIP-ViT-bigG-14-laion2B-39B-b160k": ClipVisionConfig(
        hidden_size=1664, intermediate_size=8192, num_layers=48,
        num_heads=16, image_size=224, hidden_act="gelu"),
    "open_clip_hub:ViT-L-14": ClipVisionConfig(image_size=224,
                                               hidden_act="gelu"),
    "DeepGlint-AI/mlcd-vit-bigG-patch14-336": ClipVisionConfig(
        hidden_size=1664, intermediate_size=8192, num_layers=48,
        num_heads=16, image_size=336, hidden_act="gelu", rope2d=True),
}

# EVA model_configs the reference can actually construct
# (eva_clip/model_configs/*.json; intermediate = int(width*mlp_ratio),
# heads = width // head_width)
_EVA_PRESETS = {
    "EVA01-CLIP-g-14": EvaVisionConfig(
        hidden_size=1408, intermediate_size=6144, num_layers=40,
        num_heads=16, image_size=224, patch_size=14),
    "EVA01-CLIP-g-14-plus": EvaVisionConfig(
        hidden_size=1408, intermediate_size=6144, num_layers=40,
        num_heads=16, image_size=224, patch_size=14),
    "EVA02-CLIP-B-16": EvaVisionConfig(
        hidden_size=768, intermediate_size=2048, num_layers=12,
        num_heads=12, image_size=224, patch_size=16, subln=True,
        swiglu=True, rope2d=True, intp_freq=True, pt_hw_seq_len=16),
    "EVA02-CLIP-L-14": EvaVisionConfig(
        hidden_size=1024, intermediate_size=2730, num_layers=24,
        num_heads=16, image_size=224, patch_size=14, subln=True,
        swiglu=True, rope2d=True, intp_freq=True, pt_hw_seq_len=16),
    "EVA02-CLIP-L-14-336": EvaVisionConfig(
        hidden_size=1024, intermediate_size=2730, num_layers=24,
        num_heads=16, image_size=336, patch_size=14, subln=True,
        swiglu=True, rope2d=True, intp_freq=True, pt_hw_seq_len=16),
}


def build_vision_tower(name: str, *, s2: bool = False,
                       s2_scales: Sequence[int] = (336, 672, 1008),
                       **overrides):
    """Name-dispatch tower builder (builder.py:13-42 semantics).

    Returns (cfg, init_fn, forward_fn). forward_fn(params, images)
    yields [B, N, feature_dim] (feature_dim multiplied by len(scales)
    when s2=True). SigLIP names return the models/siglip.py tower.
    """
    if "siglip" in name:
        from streamvln_tpu.configs import SigLIPConfig
        from streamvln_tpu.models import siglip
        cfg = SigLIPConfig(**overrides) if overrides else SigLIPConfig()
        return cfg, siglip.init, \
            lambda p, imgs, **kw: siglip.forward(p, cfg, imgs, **kw)
    if name in ("imagebind_huge",):
        raise ValueError(
            "imagebind towers need the external imagebind package "
            "(reference builder.py:28 has the same external "
            "dependency); use a CLIP/SigLIP tower instead")
    if "eva" in name.lower():
        base = name.split("/")[-1]
        ecfg = _EVA_PRESETS.get(base)
        if ecfg is None and base.startswith(("EVA-CLIP-8B",
                                             "EVA-CLIP-18B")):
            raise ValueError(
                f"{base}: this config passes use_rms_norm, which the "
                "reference's own CLIPVisionCfg rejects "
                "(eva_vit.py:767-793) — not constructible there "
                "either")
        if ecfg is None:
            raise ValueError(f"Unknown EVA tower: {name}")
        if overrides:
            ecfg = dataclasses.replace(ecfg, **overrides)
        return ecfg, eva_init, \
            lambda p, imgs, **kw: eva_forward(p, ecfg, imgs, **kw)
    cfg = None
    if name in _PRESETS:
        cfg = _PRESETS[name]
    elif name.startswith(("openai", "laion")) or "ShareGPT4V" in name:
        cfg = ClipVisionConfig()
    elif name.startswith("open_clip_hub"):
        cfg = ClipVisionConfig(hidden_act="gelu")
    elif "mlcd-vit-bigG-patch14" in name:
        cfg = _PRESETS["DeepGlint-AI/mlcd-vit-bigG-patch14-336"]
    elif name.startswith("hf:"):
        # generic HF tower: CLIP-arch assumption, overrides supply dims
        cfg = ClipVisionConfig()
    if cfg is None:
        raise ValueError(f"Unknown vision tower: {name}")
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    if not s2:
        return cfg, init, \
            lambda p, imgs, **kw: forward(p, cfg, imgs, **kw)

    base = cfg.image_size

    def fwd_s2(p, imgs, **kw):
        return s2_forward(lambda im: forward(p, cfg, im, **kw), imgs,
                          base, s2_scales)
    return cfg, init, fwd_s2


# ---------------------------------------------------------------------------
# HF weight conversion (transformers CLIPVisionModel state dict)
# ---------------------------------------------------------------------------

def convert_hf_clip_tower(state_dict, cfg: ClipVisionConfig,
                          dtype=jnp.float32) -> Params:
    """Map a transformers CLIPVisionModel state_dict onto our layout.

    Torch conv weight [D, 3, P, P] flattens to our channel-major
    [P*P*3, D] patchify layout as (c, ph, pw) — matching
    models/siglip.py::patchify.
    """
    import numpy as np

    def t(name):
        a = state_dict[name]
        if hasattr(a, "detach"):
            a = a.detach().cpu().numpy()
        return np.asarray(a, np.float32)

    pre = "vision_model."
    D = cfg.hidden_size
    conv = t(pre + "embeddings.patch_embedding.weight")  # [D, 3, P, P]
    patch_w = conv.reshape(D, -1).T                      # [(3*P*P), D]

    L = cfg.num_layers
    stack = {k: [] for k in ("ln1_s", "ln1_b", "q_w", "q_b", "k_w",
                             "k_b", "v_w", "v_b", "o_w", "o_b",
                             "ln2_s", "ln2_b", "fc1_w", "fc1_b",
                             "fc2_w", "fc2_b")}
    for i in range(L):
        lp = f"{pre}encoder.layers.{i}."
        stack["ln1_s"].append(t(lp + "layer_norm1.weight"))
        stack["ln1_b"].append(t(lp + "layer_norm1.bias"))
        stack["q_w"].append(t(lp + "self_attn.q_proj.weight").T)
        stack["q_b"].append(t(lp + "self_attn.q_proj.bias"))
        stack["k_w"].append(t(lp + "self_attn.k_proj.weight").T)
        stack["k_b"].append(t(lp + "self_attn.k_proj.bias"))
        stack["v_w"].append(t(lp + "self_attn.v_proj.weight").T)
        stack["v_b"].append(t(lp + "self_attn.v_proj.bias"))
        stack["o_w"].append(t(lp + "self_attn.out_proj.weight").T)
        stack["o_b"].append(t(lp + "self_attn.out_proj.bias"))
        stack["ln2_s"].append(t(lp + "layer_norm2.weight"))
        stack["ln2_b"].append(t(lp + "layer_norm2.bias"))
        stack["fc1_w"].append(t(lp + "mlp.fc1.weight").T)
        stack["fc1_b"].append(t(lp + "mlp.fc1.bias"))
        stack["fc2_w"].append(t(lp + "mlp.fc2.weight").T)
        stack["fc2_b"].append(t(lp + "mlp.fc2.bias"))

    params = {
        "patch_w": jnp.asarray(patch_w, dtype),
        "cls_embed": jnp.asarray(t(pre + "embeddings.class_embedding"),
                                 dtype),
        "pre_ln_s": jnp.asarray(t(pre + "pre_layrnorm.weight"), dtype),
        "pre_ln_b": jnp.asarray(t(pre + "pre_layrnorm.bias"), dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in stack.items()},
    }
    if cfg.rope2d:
        # MLCD towers carry a learned class-token rotary phase instead
        # of learned position embeddings (vit_rope2d_hf.py:287, 324)
        key = next((k for k in state_dict
                    if k.endswith("class_pos_emb")), None)
        if key is None:
            raise KeyError(
                "rope2d tower state dict has no class_pos_emb")
        params["class_pos_emb"] = jnp.asarray(t(key).reshape(-1),
                                              dtype)
    else:
        params["pos_embed"] = jnp.asarray(
            t(pre + "embeddings.position_embedding.weight"), dtype)
    return params
