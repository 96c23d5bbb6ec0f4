"""Qwen2 decoder (RMSNorm + RoPE + GQA + SwiGLU), TPU-first functional JAX.

Design notes (vs the reference's HF Qwen2ForCausalLM,
reference: streamvln/model/stream_video_vln.py:32-48):

- Parameters are a pytree of arrays with the per-layer weights STACKED on a
  leading [L] axis, and the layer stack is executed with `lax.scan`. This
  gives one traced/compiled block for all 28 layers (fast compiles, clean
  remat boundaries, and a natural unit for FSDP sharding annotations).
- KV cache is a fixed-capacity HBM buffer with per-row lengths, appended to
  with dynamic-slice writes. Prefill and decode are the same code path
  (decode is a prefill of S=1); causality comes from global positions, which
  reproduces HF's attention-mask-cumsum position ids for the unpadded
  bs-per-env=1 streaming case (reference: stream_video_vln.py:435-443).
- Attention dispatches through ops.attention (dense XLA reference or Pallas
  flash kernel).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from streamvln_tpu.configs import Qwen2Config
from streamvln_tpu.ops.attention import (
    dense_attention, dense_attention_kvmajor, mha_attention)

Params = dict


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(dtype)


def layer_norm_scale_only(x: jax.Array, scale: jax.Array,
                          eps: float) -> jax.Array:
    """Weight-only LayerNorm (MPT norm_1/norm_2/norm_f keep no bias)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(dtype)


def _norm(x: jax.Array, scale: jax.Array, cfg: Qwen2Config) -> jax.Array:
    if cfg.norm_type == "layernorm":
        return layer_norm_scale_only(x, scale, cfg.rms_norm_eps)
    return rms_norm(x, scale, cfg.rms_norm_eps)


def alibi_slopes(num_heads: int, bias_max: float = 8.0):
    """Per-head alibi slopes (MPT variant: next-pow-2 bank then
    interleave — transformers build_mpt_alibi_tensor)."""
    import math

    import numpy as np
    n2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, n2 + 1, dtype=np.float64) * (bias_max / n2)
    slopes = 1.0 / np.power(2.0, base)
    if n2 != num_heads:
        slopes = np.concatenate([slopes[1::2],
                                 slopes[::2]])[:num_heads]
    return jnp.asarray(slopes, jnp.float32)


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    """Inverse frequencies, [head_dim // 2]."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, HF 'half-rotation' layout.

    x: [B, S, H, D]; positions: [B, S] int32. The first D/2 dims pair with
    the second D/2 (rotate_half), matching HF Qwen2 so converted checkpoints
    are bit-compatible.
    """
    B, S, H, D = x.shape
    inv_freq = rope_frequencies(D, theta)                    # [D/2]
    angles = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None]
    cos = jnp.cos(angles)[:, :, None, :]                     # [B, S, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def swiglu(x: jax.Array, gate_w, up_w, down_w) -> jax.Array:
    gate = jnp.dot(x, gate_w, preferred_element_type=jnp.float32)
    up = jnp.dot(x, up_w, preferred_element_type=jnp.float32)
    act = jax.nn.silu(gate) * up
    return jnp.dot(act.astype(x.dtype), down_w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Fixed-capacity per-layer KV buffers with per-row fill lengths.

    k, v: [L, B, Hkv, Smax, D] — KV-head-major, the canonical TPU cache
    layout: the last two dims (Smax, D) are the hardware-tiled ones, so
    per-head sequence slices (decode-kernel DMAs, appends) stay aligned.
    length: [B] int32 (tokens currently cached).

    Quantized form (create(..., quantized=True)): k/v hold int8 and
    k_scale/v_scale hold per-(layer, row, head, position) f32 scales
    [L, B, Hkv, Smax] (scale = amax/127 over the head dim, applied at
    read). The scales carry NO trailing singleton dim: a last dim of 1
    would be lane-padded to 128 by the TPU tiler — 128x physical
    inflation (measured at 14B/SMAX 4096: ~0.8 GB per scale buffer and
    a 28% decode regression from streaming the padding).

    Quantization halves the resident cache HBM — the capacity lever
    for long contexts and the 14B-class config at batch (the 48-layer
    KV at 4096 x 8 envs is ~6.4 GB in bf16). ~1.6% scale overhead;
    appends quantize post-RoPE.
    """
    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, cfg: Qwen2Config, batch: int, capacity: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, capacity,
                 cfg.head_dim)
        length = jnp.zeros((batch,), jnp.int32)
        if quantized:
            sshape = shape[:-1]
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       length=length,
                       k_scale=jnp.ones(sshape, jnp.float32),
                       v_scale=jnp.ones(sshape, jnp.float32))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=length)

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def reset_rows(self, row_mask: jax.Array) -> "KVCache":
        """Zero the lengths of selected rows (cheap window reset — stale KV
        is never attended because key validity is pos < length)."""
        return KVCache(self.k, self.v,
                       jnp.where(row_mask, 0, self.length),
                       self.k_scale, self.v_scale)


def _append_rows(buf: jax.Array, new: jax.Array,
                 offsets: jax.Array) -> jax.Array:
    """buf: [B, Hkv, Smax, D]; new: [B, S, Hkv, D]; offsets: [B]."""
    new_t = new.transpose(0, 2, 1, 3)        # [B, Hkv, S, D]

    def one(row, n, off):
        return jax.lax.dynamic_update_slice(row, n, (0, off, 0))
    return jax.vmap(one)(buf, new_t, offsets)


def _append_stack(buf: jax.Array, new: jax.Array, layer: jax.Array,
                  offsets: jax.Array,
                  write_mask: Optional[jax.Array] = None) -> jax.Array:
    """Append new tokens' KV into one layer of a stacked cache, in place.

    buf: [L, B, Hkv, Smax, D] (scan carry — XLA keeps the update
    in-place, so only the S new tokens are written, not the whole
    cache); new: [B, S, Hkv, D]; layer: scalar int; offsets: [B].

    write_mask [B] bool: rows with False write back what they read at
    the (identically clamped) offset — an exact self-copy. This
    protects IDLE batch rows: a padded-bucket write at a full row's
    offset gets its start CLAMPED by dynamic_update_slice and would
    otherwise smash live low slots with dummy KV (the active rows'
    overflow is guarded host-side; idle rows can't be — their lengths
    aren't part of the request).
    """
    new_t = new.transpose(0, 2, 1, 3)        # [B, Hkv, S, D]
    # Unrolled per-row dynamic_update_slice (B is static): a DUS chain
    # on the scan carry aliases in place, whereas a vmapped DUS lowers
    # to a scatter that XLA copies (measured: one full-capacity
    # read+write per decoded token).
    zero = jnp.zeros((), jnp.int32)
    for b in range(new.shape[0]):
        upd = new_t[b][None, None]
        if write_mask is not None:
            cur = jax.lax.dynamic_slice(
                buf, (layer, jnp.int32(b), zero, offsets[b], zero),
                upd.shape)
            upd = jnp.where(write_mask[b], upd, cur)
        buf = jax.lax.dynamic_update_slice(
            buf, upd,
            (layer, jnp.int32(b), zero, offsets[b], zero))
    return buf


def _append_stack_scale(buf: jax.Array, new: jax.Array,
                        layer: jax.Array, offsets: jax.Array,
                        write_mask: Optional[jax.Array] = None
                        ) -> jax.Array:
    """_append_stack for the 4D scale buffers.

    buf: [L, B, Hkv, Smax]; new: [B, S, Hkv]; layer: scalar; offsets
    [B]. Same in-place DUS-chain contract as _append_stack."""
    new_t = new.transpose(0, 2, 1)            # [B, Hkv, S]
    zero = jnp.zeros((), jnp.int32)
    for b in range(new.shape[0]):
        upd = new_t[b][None, None]
        if write_mask is not None:
            cur = jax.lax.dynamic_slice(
                buf, (layer, jnp.int32(b), zero, offsets[b]),
                upd.shape)
            upd = jnp.where(write_mask[b], upd, cur)
        buf = jax.lax.dynamic_update_slice(
            buf, upd, (layer, jnp.int32(b), zero, offsets[b]))
    return buf


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, S, H, D] -> (int8 values, f32 scales [B, S, H]);
    symmetric per-(token, head), scale = amax/127, post-RoPE."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def _dequant_kv(buf: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """[B, H, Smax, D] int8 * [B, H, Smax] f32 -> dtype. The convert
    + broadcast-multiply sit in the attention matmul's operand stream;
    the resident cache stays at 1 B/element."""
    return (buf.astype(jnp.float32) * scale[..., None]).astype(dtype)


def make_scratch(cfg: Qwen2Config, batch: int, capacity: int,
                 cache: KVCache) -> KVCache:
    """A decode-loop scratch cache matching `cache`'s dtype/quantization
    (see forward(scratch=...)). capacity should be sublane-aligned
    (multiple of 8) and >= the most tokens one decode loop can write."""
    return KVCache.create(cfg, batch, capacity, dtype=cache.k.dtype,
                          quantized=cache.quantized)


def merge_scratch(cache: KVCache, scratch: KVCache,
                  write_mask: Optional[jax.Array] = None) -> KVCache:
    """Fold a decode loop's scratch KV into the big cache: ONE
    out-of-loop DUS chain per row at the row's base offset (in-place on
    donated buffers — the whole point: no copy is carried across loop
    iterations). Writes the full padded scratch extent; slots past the
    merged length hold garbage that is never attended (visibility =
    pos < length) and is overwritten by the next call's append.

    write_mask [B] bool: False rows (idle batch rows) write back what
    they read — an exact self-copy — because their base offset can sit
    at a full row's end where dynamic_update_slice would CLAMP the
    start over live slots (same contract as _append_stack). Callers
    must guarantee active rows satisfy base + scratch.capacity <=
    cache.capacity (the engine's host-side overflow guard).

    Returns the merged cache with length = cache.length +
    scratch.length for every row. Idle rows' lengths are already
    correct (their scratch.length never advances — the decode loops
    freeze it via the done mask); only force-masked inactive rows are
    restored by callers (the engine's saved_length reinstate).
    """
    k, v, ks, vs = cache.k, cache.v, cache.k_scale, cache.v_scale
    B = k.shape[1]
    zero = jnp.zeros((), jnp.int32)
    offs = cache.length

    def wr(buf, src, b, is_scale):
        upd = src[:, b][:, None]          # [L, 1, Hkv, Ss(, D)]
        start = (zero, jnp.int32(b), zero, offs[b]) if is_scale \
            else (zero, jnp.int32(b), zero, offs[b], zero)
        if write_mask is not None:
            cur = jax.lax.dynamic_slice(buf, start, upd.shape)
            upd = jnp.where(write_mask[b], upd, cur)
        return jax.lax.dynamic_update_slice(buf, upd, start)

    for b in range(B):
        k = wr(k, scratch.k, b, False)
        v = wr(v, scratch.v, b, False)
        if ks is not None:
            ks = wr(ks, scratch.k_scale, b, True)
            vs = wr(vs, scratch.v_scale, b, True)
    return KVCache(k, v, cache.length + scratch.length, ks, vs)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init(rng: jax.Array, cfg: Qwen2Config,
         dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (layer weights stacked on axis 0)."""
    keys = jax.random.split(rng, 16)
    L, Dm, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh, V = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, \
        cfg.vocab_size

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    layers = {
        "ln1": jnp.ones((L, Dm), dtype),
        "q_w": dense(keys[1], (L, Dm, Hq * Dh), Dm),
        "q_b": jnp.zeros((L, Hq * Dh), dtype),
        "k_w": dense(keys[2], (L, Dm, Hkv * Dh), Dm),
        "k_b": jnp.zeros((L, Hkv * Dh), dtype),
        "v_w": dense(keys[3], (L, Dm, Hkv * Dh), Dm),
        "v_b": jnp.zeros((L, Hkv * Dh), dtype),
        "o_w": dense(keys[4], (L, Hq * Dh, Dm), Hq * Dh),
        "ln2": jnp.ones((L, Dm), dtype),
    }
    if cfg.num_experts:
        E = cfg.num_experts
        Fe = cfg.moe_intermediate_size or F
        layers.update({
            "router_w": dense(keys[5], (L, Dm, E), Dm),
            "e_gate": dense(keys[6], (L, E, Dm, Fe), Dm),
            "e_up": dense(keys[7], (L, E, Dm, Fe), Dm),
            "e_down": dense(keys[9], (L, E, Fe, Dm), Fe),
        })
        if cfg.shared_expert_intermediate_size:
            Fs = cfg.shared_expert_intermediate_size
            layers.update({
                "s_gate_w": dense(keys[10], (L, Dm, Fs), Dm),
                "s_up_w": dense(keys[11], (L, Dm, Fs), Dm),
                "s_down_w": dense(keys[12], (L, Fs, Dm), Fs),
                "s_route_w": dense(keys[13], (L, Dm, 1), Dm),
            })
    else:
        layers.update({
            "up_w": dense(keys[6], (L, Dm, F), Dm),
            "down_w": dense(keys[7], (L, F, Dm), F),
        })
        if cfg.mlp_gated:
            layers["gate_w"] = dense(keys[5], (L, Dm, F), Dm)
    params = {
        "embed": dense(keys[0], (V, Dm), Dm),
        "layers": layers,
        "final_norm": jnp.ones((Dm,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[8], (Dm, V), Dm)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attend(cfg: Qwen2Config, attn_impl: str, q, k, v, q_pos, k_pos,
            kv_major: bool = False, bias=None, kv_scales=None):
    """Attention with visibility rule `k_pos <= q_pos` (invalid keys carry
    a huge k_pos). Dispatch:
    - S==1 on a KV-major cache + TPU: Pallas ring-buffer decode kernel
      (DMAs only the live prefix; ops/decode_attention.py)
    - S>=64 prefill/training + TPU, 128-aligned head dim: Pallas flash
    - otherwise dense XLA with the equivalent mask."""
    on_tpu = jax.default_backend() == "tpu"
    kernels_ok = bias is None and attn_impl in ("flash", "auto") and \
        cfg.head_dim % 128 == 0 and (attn_impl == "flash" or on_tpu)

    if kv_major:
        if kv_scales is not None:
            # int8 cache fed straight to the MXU; scales fold into the
            # logits/probabilities (see dense_attention_kvmajor)
            mask = k_pos[:, None, :] <= q_pos[:, :, None]
            return dense_attention_kvmajor(
                q, k, v, mask, logits_soft_cap=cfg.attn_logits_soft_cap,
                bias=bias, k_scale=kv_scales[0], v_scale=kv_scales[1])
        # the Pallas decode kernel only wins when its per-layer launch
        # cost is amortized (very long caches / many KV heads); measured
        # on v5e-1 @ 7B it LOSES ~9 ms/token to XLA's fused dense path,
        # so it is opt-in (attn_impl="decode_kernel")
        if attn_impl == "decode_kernel" and bias is None \
                and q.shape[1] == 1 \
                and cfg.head_dim % 128 == 0 and k.shape[2] % 512 == 0:
            from streamvln_tpu.ops import decode_attention as da
            # visible keys for a single query at pos p: indices 0..p
            return da.decode_attention(q, k, v, q_pos[:, 0] + 1)
        if kernels_ok and q.shape[1] >= 64:
            from streamvln_tpu.ops import flash_attention as fa
            return fa.flash_attention(
                q, k, v, q_pos, k_pos, kv_major=True,
                logits_soft_cap=cfg.attn_logits_soft_cap)
        mask = k_pos[:, None, :] <= q_pos[:, :, None]
        return dense_attention_kvmajor(
            q, k, v, mask, logits_soft_cap=cfg.attn_logits_soft_cap,
            bias=bias)

    if kernels_ok and q.shape[1] >= 64:
        from streamvln_tpu.ops import flash_attention as fa
        return fa.flash_attention(
            q, k, v, q_pos, k_pos,
            logits_soft_cap=cfg.attn_logits_soft_cap)
    if attn_impl == "chunked" and bias is None and q.shape[1] >= 64:
        # flash algorithm in plain XLA (O(block^2) memory): the
        # long-context path where the Pallas kernel is unavailable —
        # 32k-seq training on CPU CI, or kernel-rejected shapes
        # (ops/attention.py chunked_attention)
        from streamvln_tpu.ops.attention import chunked_attention
        return chunked_attention(
            q, k, v, q_pos, k_pos,
            logits_soft_cap=cfg.attn_logits_soft_cap)
    mask = k_pos[:, None, :] <= q_pos[:, :, None]
    return dense_attention(q, k, v, mask,
                           logits_soft_cap=cfg.attn_logits_soft_cap,
                           bias=bias)


def _proj(x, p, name, lora_scale=None, act_int8=False, int4_stk=None,
          layer_idx=None):
    """x @ p[name] (+ bias if present) with optional LoRA delta.

    int8 weights (models/quant.py): per-output-column scales commute
    with the contraction, so the scale is applied to the OUTPUT —
    `dot(x, w_i8) * scale` — which lets XLA fuse the int8->bf16 convert
    into the dot's operand stream instead of materializing a scaled
    full-precision weight copy (2x decode HBM traffic otherwise).
    act_int8 additionally quantizes the activations per-token so the
    contraction runs int8 x int8 -> int32 on the MXU (2x peak; for
    compute-bound prefill, cfg.act_int8).

    int4_stk + layer_idx: kernel-eligible packed-int4 weights arrive
    STACKED [L, din/2, dout] (pulled out of the layer scan's xs by
    `forward`) and dispatch to the fused dequant-matmul Pallas kernel
    (ops/int4_matmul.py) for small row counts — decode streams the
    packed 0.5 B/weight straight from HBM. Large row counts (prefill /
    training) go through the Pallas dequant-materialize + dense-dot
    path (int4_prefill_matmul): the materialization is bandwidth-cheap
    against a compute-bound dot, and XLA's own nibble-unpack codegen
    is ~10x off bandwidth (and OOMs the 14B on i32 temporaries)."""
    if int4_stk is not None and name in int4_stk:
        from streamvln_tpu.ops.int4_matmul import (
            KERNEL_MAX_ROWS, int4_matmul, int4_prefill_matmul)
        wq, sq = int4_stk[name], int4_stk[name + "_scale"]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        interp = jax.default_backend() != "tpu"
        if x2.shape[0] <= KERNEL_MAX_ROWS:
            out = int4_matmul(x2, wq, sq, layer_idx, interp)
        else:
            out = int4_prefill_matmul(x2, wq, sq, layer_idx, interp)
        out = out.reshape(*lead, wq.shape[-1])
        w = None
        scale = None
    elif p[name].dtype == jnp.uint8:
        # packed int4 outside the stacked-kernel path (unstacked or
        # ineligible shapes): group-wise scales do not commute with the
        # contraction — materialize the dequant (models/quant.py)
        from streamvln_tpu.models.quant import dequant_int4
        w = dequant_int4(p[name], p[name + "_scale"], x.dtype)
        scale = None
    elif p[name].dtype == jnp.int8:
        w = p[name]
        scale = p[name + "_scale"].astype(jnp.float32)  # [.., 1, dout]
        if act_int8:
            from streamvln_tpu.models.quant import int8_dynamic_matmul
            out = int8_dynamic_matmul(x, w, scale)
            scale = None
            w = None
        else:
            w = w.astype(x.dtype)
    else:
        w = p[name]
        scale = None
    if w is not None:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if scale is not None:
        out = out * scale
    bias = p.get(name[:-2] + "_b") if name.endswith("_w") else None
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    a = p.get(name + "_lora_a")
    if a is not None and lora_scale is not None:
        low = jnp.dot(x.astype(jnp.float32), a.astype(jnp.float32))
        delta = jnp.dot(low, p[name + "_lora_b"].astype(jnp.float32))
        out = out + delta * lora_scale
    return out.astype(x.dtype)


def _mlp_act_fn(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "gelu_tanh":
        return functools.partial(jax.nn.gelu, approximate=True)
    if name == "gelu":
        return functools.partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unknown mlp_act: {name}")


def _moe_mlp(cfg: Qwen2Config, h: jax.Array, p) -> jax.Array:
    """Sparse-MoE MLP (Mixtral block_sparse_moe / Qwen2-MoE mlp).

    Router: softmax over experts in fp32, top-k, optionally
    renormalized over the selected k (Mixtral yes, Qwen2-MoE no).
    Compute is the dense one-hot formulation — every expert runs on
    every token and a [N, E] combine matrix selects — which is the
    shardable TPU-first layout (expert axis maps onto the mesh like
    any other stacked dim) at the cost of E/k extra MLP FLOPs; a
    capacity-based ragged dispatch is the known optimization when an
    MoE model becomes a serving flagship. Qwen2-MoE adds an always-on
    shared expert gated by a per-token sigmoid.
    """
    B, S, D = h.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    hf = h.reshape(B * S, D)
    router = jnp.dot(hf, p["router_w"],
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router, axis=-1)            # [N, E] f32
    topv, topi = jax.lax.top_k(probs, K)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(topi, E, dtype=jnp.float32)
        * topv[..., None], axis=1)                     # [N, E]

    def expert_w(name):
        """int8 expert stacks carry per-output-channel scales
        [E, 1, dout] (models/quant.py MOE_QUANT_TARGETS)."""
        w = p[name]
        if w.dtype == jnp.int8:
            return w.astype(h.dtype), p[name + "_scale"][:, 0, :][None]
        if w.dtype == jnp.uint8:
            from streamvln_tpu.models.quant import dequant_int4
            return dequant_int4(w, p[name + "_scale"], h.dtype), None
        return w, None

    act_fn = _mlp_act_fn(cfg.mlp_act)
    wg, sg_ = expert_w("e_gate")
    wu, su_ = expert_w("e_up")
    wd, sd_ = expert_w("e_down")
    if cfg.moe_dispatch == "capacity":
        # matmul-based capacity dispatch: tokens land in per-expert
        # [C] buckets (slot = arrival rank within the expert); the
        # expert MLPs run on [E, C, D] — k/E of the dense-path FLOPs.
        # Overflow beyond C drops that expert's contribution for the
        # token (standard TPU MoE trade; capacity_factor sizes C).
        import math
        N = hf.shape[0]
        C = min(N, max(1, math.ceil(N * K / E
                                    * cfg.moe_capacity_factor)))
        onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [N,K,E]
        flat = onehot.reshape(N * K, E)
        rank = jnp.cumsum(flat, axis=0) - flat        # arrivals before
        keep = (rank < C) * flat                      # [N*K, E]
        slot = jax.nn.one_hot(rank.astype(jnp.int32), C,
                              dtype=jnp.float32)      # [N*K, E, C]
        disp = keep[:, :, None] * slot
        disp = disp.reshape(N, K, E, C)
        disp_tok = disp.sum(axis=1)                   # 0/1 [N, E, C]
        combine_w = (disp * topv[:, :, None, None]).sum(axis=1)

        xe = jnp.einsum("nec,nd->ecd", disp_tok.astype(h.dtype), hf,
                        preferred_element_type=jnp.float32
                        ).astype(h.dtype)             # [E, C, D]
        gate = jnp.einsum("ecd,edf->ecf", xe, wg,
                          preferred_element_type=jnp.float32)
        if sg_ is not None:
            gate = gate * sg_.reshape(E, 1, -1)
        up = jnp.einsum("ecd,edf->ecf", xe, wu,
                        preferred_element_type=jnp.float32)
        if su_ is not None:
            up = up * su_.reshape(E, 1, -1)
        act = (act_fn(gate) * up).astype(h.dtype)
        ye = jnp.einsum("ecf,efd->ecd", act, wd,
                        preferred_element_type=jnp.float32)
        if sd_ is not None:
            ye = ye * sd_.reshape(E, 1, -1)
        out = jnp.einsum("nec,ecd->nd",
                         combine_w.astype(jnp.float32), ye)
    else:
        gate = jnp.einsum("nd,edf->nef", hf, wg,
                          preferred_element_type=jnp.float32)
        if sg_ is not None:
            gate = gate * sg_
        up = jnp.einsum("nd,edf->nef", hf, wu,
                        preferred_element_type=jnp.float32)
        if su_ is not None:
            up = up * su_
        act = (act_fn(gate) * up).astype(h.dtype)
        outs = jnp.einsum("nef,efd->ned", act, wd,
                          preferred_element_type=jnp.float32)
        if sd_ is not None:
            outs = outs * sd_
        out = jnp.einsum("ne,ned->nd", combine, outs)

    if "s_gate_w" in p:
        sg = _proj(hf, p, "s_gate_w")
        su = _proj(hf, p, "s_up_w")
        shared = _proj((act_fn(sg.astype(jnp.float32))
                        * su.astype(jnp.float32)).astype(h.dtype),
                       p, "s_down_w")
        srg = jax.nn.sigmoid(jnp.dot(
            hf, p["s_route_w"], preferred_element_type=jnp.float32))
        out = out + srg * shared
    return out.reshape(B, S, D).astype(h.dtype)


def _layer_step(cfg: Qwen2Config, attn_impl: str,
                carry, layer_params,
                positions, k_pos, cache_kv=None, cache_offsets=None,
                lora_scale=None, mlp_chunk=None, int4_stk=None,
                layer_idx=None, write_mask=None,
                scratch_kv=None, scratch_offsets=None,
                base_lengths=None):
    """One decoder block. carry = hidden states [B, S, Dm].

    k_pos: positions of keys — in-sequence positions (no cache) or cache
    slot indices (cache path); invalid keys hold a huge sentinel.

    mlp_chunk: sequence-chunk the MLP (exact — the MLP is pointwise over
    tokens) with a per-chunk jax.checkpoint, bounding its fwd/bwd temps
    to [B, mlp_chunk, F] instead of [B, S, F]. At 7B/32k the full-seq
    f32 gate/up/act temps are 2.3 GB EACH and are the binding
    allocations on a 16 GB chip even under nested layer remat.
    """
    x = carry
    p = layer_params
    B, S, Dm = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    off = 1.0 if cfg.norm_offset else 0.0   # gemma: scale = 1 + w
    h = _norm(x, p["ln1"] + off if off else p["ln1"], cfg)
    ai8 = cfg.act_int8
    i4, li = int4_stk, layer_idx
    if "qkv_w" in p or (i4 is not None and "qkv_w" in i4):
        # fused single-launch qkv (models/fuse.py): output columns are
        # independent reductions, so the split results are bit-equal
        # to separate projections
        qkv = _proj(h, p, "qkv_w", lora_scale, ai8, i4, li)
        q, k, v = jnp.split(
            qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=-1)
        q = q.reshape(B, S, Hq, Dh)
        k = k.reshape(B, S, Hkv, Dh)
        v = v.reshape(B, S, Hkv, Dh)
    else:
        q = _proj(h, p, "q_w", lora_scale, ai8, i4, li).reshape(
            B, S, Hq, Dh)
        k = _proj(h, p, "k_w", lora_scale, ai8, i4, li).reshape(
            B, S, Hkv, Dh)
        v = _proj(h, p, "v_w", lora_scale, ai8, i4, li).reshape(
            B, S, Hkv, Dh)

    attn_bias = None
    if cfg.positional == "rope":
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)
    elif cfg.positional == "alibi":
        # additive per-head bias -slope * (q_pos - k_pos); invisible
        # keys (k_pos > q_pos or sentinel) are removed by the mask, so
        # the formula is exact for both in-sequence and cache-slot
        # k_pos (slot index == global position)
        slopes = alibi_slopes(cfg.num_heads)
        dist = positions[:, None, :, None].astype(jnp.float32) - \
            k_pos[:, None, None, :].astype(jnp.float32)
        attn_bias = -slopes[None, :, None, None] * dist

    kv_scales = None
    if scratch_kv is not None:
        # Decode-loop scratch mode: the big cache (cache_kv, whole
        # stacked [L, ...] buffers + layer index) is READ-ONLY and
        # loop-invariant; this call's tokens append into the tiny
        # scratch cache instead, and attention runs over both sources
        # under one softmax (ops/attention.py
        # dense_attention_kvmajor_2src). Appending into the full cache
        # inside a while-loop forces XLA to carry an S-untiled relayout
        # copy of the whole capacity (docs/decode_roofline.md).
        kc, vc, ks, vs, layer_idx = cache_kv
        sk, sv, sks, svs = scratch_kv
        if sks is not None:
            kq, ksc = _quantize_kv(k)
            vq, vsc = _quantize_kv(v)
            sk = _append_stack(sk, kq, layer_idx, scratch_offsets)
            sv = _append_stack(sv, vq, layer_idx, scratch_offsets)
            sks = _append_stack_scale(sks, ksc, layer_idx,
                                      scratch_offsets)
            svs = _append_stack_scale(svs, vsc, layer_idx,
                                      scratch_offsets)
        else:
            sk = _append_stack(sk, k, layer_idx, scratch_offsets)
            sv = _append_stack(sv, v, layer_idx, scratch_offsets)

        def at_layer(a):
            return jax.lax.dynamic_index_in_dim(a, layer_idx, 0,
                                                keepdims=False)
        ckl, cvl = at_layer(kc), at_layer(vc)
        skl, svl = at_layer(sk), at_layer(sv)
        scales1 = (at_layer(ks), at_layer(vs)) if ks is not None \
            else None
        scales2 = (at_layer(sks), at_layer(svs)) if sks is not None \
            else None
        Ss = skl.shape[2]
        # scratch keys' global positions; slots past the current write
        # hold stale data at HIGHER positions than any live query, so
        # the standard visibility rule hides them (same invariant as
        # the big cache). k_pos already masks big-cache slots >= the
        # row's base length (stale rollback slots would otherwise sit
        # at visible indices).
        k_pos_scr = base_lengths[:, None] + \
            jnp.arange(Ss, dtype=jnp.int32)[None]
        mask1 = k_pos[:, None, :] <= positions[:, :, None]
        mask2 = k_pos_scr[:, None, :] <= positions[:, :, None]
        bias2 = None
        if attn_bias is not None:
            # alibi: recompute the per-source additive bias from each
            # source's key positions (masked slots are overridden by
            # the visibility mask downstream)
            slopes = alibi_slopes(cfg.num_heads)
            dist2 = positions[:, None, :, None].astype(jnp.float32) - \
                k_pos_scr[:, None, None, :].astype(jnp.float32)
            bias2 = -slopes[None, :, None, None] * dist2
        from streamvln_tpu.ops.attention import (
            dense_attention_kvmajor_2src)
        attn = dense_attention_kvmajor_2src(
            q, ckl, cvl, mask1, skl, svl, mask2,
            logits_soft_cap=cfg.attn_logits_soft_cap,
            bias1=attn_bias, bias2=bias2,
            kv_scales1=scales1, kv_scales2=scales2)
        new_cache = (sk, sv, sks, svs)
    elif cache_kv is not None:
        if len(cache_kv) == 5:
            # stacked-carry path: whole [L, ...] cache (+ optional int8
            # scales) + layer index. Append the S new tokens in place
            # (the cache rides the scan carry, so XLA writes only the
            # new tokens instead of slice-copying + re-stacking the
            # full capacity every step), then read this layer's slice
            # for attention.
            kc, vc, ks, vs, layer_idx = cache_kv
            wm = write_mask
            if ks is not None:
                kq, ksc = _quantize_kv(k)
                vq, vsc = _quantize_kv(v)
                kc = _append_stack(kc, kq, layer_idx, cache_offsets, wm)
                vc = _append_stack(vc, vq, layer_idx, cache_offsets, wm)
                ks = _append_stack_scale(ks, ksc, layer_idx,
                                         cache_offsets, wm)
                vs = _append_stack_scale(vs, vsc, layer_idx,
                                         cache_offsets, wm)
                cdt = x.dtype
                ksl = jax.lax.dynamic_index_in_dim(ks, layer_idx, 0,
                                                   keepdims=False)
                vsl = jax.lax.dynamic_index_in_dim(vs, layer_idx, 0,
                                                   keepdims=False)
                ck = jax.lax.dynamic_index_in_dim(kc, layer_idx, 0,
                                                  keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(vc, layer_idx, 0,
                                                  keepdims=False)
                if S < 64 and attn_impl != "decode_kernel":
                    # decode / short prefill takes the dense kv-major
                    # path: feed int8 + scales directly, no
                    # cache-sized dequant temp (ops/attention.py)
                    kv_scales = (ksl, vsl)
                else:
                    ck = _dequant_kv(ck, ksl, cdt)
                    cv = _dequant_kv(cv, vsl, cdt)
            else:
                kc = _append_stack(kc, k, layer_idx, cache_offsets, wm)
                vc = _append_stack(vc, v, layer_idx, cache_offsets, wm)
                ck = jax.lax.dynamic_index_in_dim(kc, layer_idx, 0,
                                                  keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(vc, layer_idx, 0,
                                                  keepdims=False)
            new_cache = (kc, vc, ks, vs)
        else:
            ck, cv = cache_kv
            ck = _append_rows(ck, k, cache_offsets)  # [B, Hkv, Smax, Dh]
            cv = _append_rows(cv, v, cache_offsets)
            new_cache = (ck, cv)
        attn = _attend(cfg, attn_impl, q, ck, cv, positions, k_pos,
                       kv_major=True, bias=attn_bias,
                       kv_scales=kv_scales)
    else:
        attn = _attend(cfg, attn_impl, q, k, v, positions, k_pos,
                       bias=attn_bias)
        new_cache = None

    attn = attn.reshape(B, S, Hq * Dh)
    x = x + _proj(attn, p, "o_w", lora_scale, ai8, i4, li)

    h = _norm(x, p["ln2"] + off if off else p["ln2"], cfg)
    if cfg.num_experts:
        x = x + _moe_mlp(cfg, h, p)
    else:
        act_fn = _mlp_act_fn(cfg.mlp_act)

        def _mlp(hb):
            if "gu_w" in p or (i4 is not None and "gu_w" in i4):
                gu = _proj(hb, p, "gu_w", lora_scale, ai8, i4, li)
                gate, up = jnp.split(gu, 2, axis=-1)
                act = (act_fn(gate.astype(jnp.float32))
                       * up.astype(jnp.float32)).astype(x.dtype)
            else:
                up = _proj(hb, p, "up_w", lora_scale, ai8, i4, li)
                if cfg.mlp_gated:
                    gate = _proj(hb, p, "gate_w", lora_scale, ai8,
                                 i4, li)
                    act = (act_fn(gate.astype(jnp.float32))
                           * up.astype(jnp.float32)).astype(x.dtype)
                else:
                    act = act_fn(up.astype(jnp.float32)).astype(x.dtype)
            return _proj(act, p, "down_w", lora_scale, ai8, i4, li)

        if mlp_chunk and S > mlp_chunk and S % mlp_chunk == 0:
            # token-chunked, per-chunk-rematted MLP: identical math per
            # token (chunking is over rows), so results are bit-exact;
            # the inner checkpoint keeps only each chunk's input as the
            # scan residual and recomputes gate/up/act per chunk in the
            # backward pass.
            hseq = h.reshape(B, S // mlp_chunk, mlp_chunk,
                             Dm).swapaxes(0, 1)
            _, ys = jax.lax.scan(
                lambda c, hb: (c, jax.checkpoint(_mlp)(hb)), None, hseq)
            x = x + ys.swapaxes(0, 1).reshape(B, S, Dm)
        else:
            x = x + _mlp(h)
    return x, new_cache


INVALID_POS = 1 << 30

_INT4_KERNEL_NAMES = ("q_w", "k_w", "v_w", "o_w",
                      "gate_w", "up_w", "down_w",
                      "qkv_w", "gu_w")       # fused (models/fuse.py)


def _split_int4_stacks(layers):
    """Pull kernel-eligible packed-int4 projection stacks out of the
    scanned layer pytree so the layer scans close over them: the fused
    dequant-matmul kernel (ops/int4_matmul.py) reads the whole
    [L, din/2, dout] stack from HBM and scalar-prefetches the layer
    index, so riding the scan xs would materialize a per-layer operand
    copy for nothing. Returns (scan_layers, stk-or-None)."""
    from streamvln_tpu.ops.int4_matmul import int4_kernel_eligible
    stk = {}
    rest = dict(layers)
    for name in _INT4_KERNEL_NAMES:
        w = layers.get(name)
        s = layers.get(name + "_scale")
        if w is not None and s is not None \
                and getattr(w, "dtype", None) == jnp.uint8 \
                and int4_kernel_eligible(w, s):
            stk[name] = rest.pop(name)
            stk[name + "_scale"] = rest.pop(name + "_scale")
    return rest, (stk or None)


def forward(
    params: Params,
    cfg: Qwen2Config,
    inputs_embeds: jax.Array,              # [B, S, Dm]
    positions: jax.Array,                  # [B, S] global positions
    cache: Optional[KVCache] = None,
    scratch: Optional[KVCache] = None,  # decode-loop scratch mode: the
    # big cache is READ-ONLY (length = base fill); new KV appends into
    # this small per-call buffer at scratch.length offsets. Returns the
    # updated SCRATCH as the second output. Keeps the big cache
    # loop-invariant inside decode while-loops (see _layer_step).
    new_lengths: Optional[jax.Array] = None,  # [B] real (unpadded) new tokens
    valid: Optional[jax.Array] = None,     # [B, S] bool; False = padding
    attn_impl: str = "auto",
    remat: bool = False,
    remat_chunk: Optional[int] = None,  # nested remat: layers per chunk
    mlp_chunk: Optional[int] = None,    # token-chunked MLP (see
    # _layer_step docstring; long-context training memory)
    write_mask: Optional[jax.Array] = None,  # [B] bool: False rows'
    # cache appends become exact self-copies (idle batch rows whose
    # padded write would clamp over live slots; see _append_stack)
    logits_positions: Optional[jax.Array] = None,  # [B] -> logits only
    # at these in-sequence indices ([B, 1, V]); saves the full-vocab
    # [B, S, V] projection during prefill (HF num_logits_to_keep parity)
    return_hidden: bool = False,   # skip lm_head; return normed hiddens
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack. Returns (logits [B, S, V], updated cache).

    Visibility rule everywhere: key j visible to query i iff
    k_pos[j] <= q_pos[i]. With a cache, k_pos is the cache slot index
    (slots past the row's fill length hold stale data at higher indices
    than any live query position, so they are naturally invisible);
    without a cache, k_pos is the in-sequence position, with padding keys
    (valid=False) pushed to an invisible sentinel.
    """
    B, S, Dm = inputs_embeds.shape
    x = inputs_embeds

    if scratch is not None:
        assert cache is not None
        # scratch mode has no per-row masked-append or padding support:
        # a caller passing write_mask/valid expecting the
        # append-in-place path's idle-row self-copy contract would get
        # unmasked scratch appends silently (callers instead restore
        # idle rows' lengths after the loop — see merge_scratch)
        assert write_mask is None, "scratch mode: use length restore"
        assert valid is None, "scratch mode has no padding support"
        assert not remat, "scratch mode is inference-only (no remat)"
        if new_lengths is None:
            new_lengths = jnp.full((B,), S, jnp.int32)
        base = cache.length
        idx = jnp.broadcast_to(
            jnp.arange(cache.capacity, dtype=jnp.int32)[None],
            (B, cache.capacity))
        # big-cache slots at/past the base fill may hold stale rollback
        # data at otherwise-visible indices — mask them out explicitly
        # (in the append-in-place path they are overwritten instead)
        k_pos = jnp.where(idx < base[:, None], idx, INVALID_POS)
        offsets = scratch.length

        lora_scale = params.get("lora_scale")
        scan_layers, int4_stk = _split_int4_stacks(params["layers"])

        def step(carry, xs):
            x, sk, sv, sks, svs = carry
            lp, layer_idx = xs
            x, (sk, sv, sks, svs) = _layer_step(
                cfg, attn_impl, x, lp, positions, k_pos,
                cache_kv=(cache.k, cache.v, cache.k_scale,
                          cache.v_scale, layer_idx),
                scratch_kv=(sk, sv, sks, svs),
                scratch_offsets=offsets, base_lengths=base,
                lora_scale=lora_scale, int4_stk=int4_stk,
                layer_idx=layer_idx)
            return (x, sk, sv, sks, svs), None

        (x, nsk, nsv, nsks, nsvs), _ = jax.lax.scan(
            step, (x, scratch.k, scratch.v,
                   scratch.k_scale, scratch.v_scale),
            (scan_layers,
             jnp.arange(cfg.num_layers, dtype=jnp.int32)))
        new_cache = KVCache(nsk, nsv, scratch.length + new_lengths,
                            nsks, nsvs)
    elif cache is not None:
        if new_lengths is None:
            new_lengths = jnp.full((B,), S, jnp.int32)
        k_pos = jnp.broadcast_to(
            jnp.arange(cache.capacity, dtype=jnp.int32)[None],
            (B, cache.capacity))
        offsets = cache.length

        lora_scale = params.get("lora_scale")
        scan_layers, int4_stk = _split_int4_stacks(params["layers"])

        def step(carry, xs):
            x, kc, vc, ks, vs = carry
            lp, layer_idx = xs
            x, (kc, vc, ks, vs) = _layer_step(
                cfg, attn_impl, x, lp, positions, k_pos,
                cache_kv=(kc, vc, ks, vs, layer_idx),
                cache_offsets=offsets,
                lora_scale=lora_scale, int4_stk=int4_stk,
                layer_idx=layer_idx, write_mask=write_mask)
            return (x, kc, vc, ks, vs), None

        step_fn = jax.checkpoint(step) if remat else step
        (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
            step_fn, (x, cache.k, cache.v,
                      cache.k_scale, cache.v_scale),
            (scan_layers,
             jnp.arange(cfg.num_layers, dtype=jnp.int32)))
        new_cache = KVCache(new_k, new_v, cache.length + new_lengths,
                            new_ks, new_vs)
    else:
        if valid is None:
            k_pos = positions
        else:
            k_pos = jnp.where(valid, positions, INVALID_POS)

        lora_scale = params.get("lora_scale")
        scan_layers, int4_stk = _split_int4_stacks(params["layers"])

        def step(carry, xs):
            lp, idx = xs
            x, _ = _layer_step(cfg, attn_impl, carry, lp, positions,
                               k_pos, lora_scale=lora_scale,
                               mlp_chunk=mlp_chunk, int4_stk=int4_stk,
                               layer_idx=idx)
            return x, None

        step_fn = jax.checkpoint(step) if remat else step
        if remat and remat_chunk and remat_chunk > 1 \
                and cfg.num_layers % remat_chunk == 0:
            # nested remat: Python-unrolled layer CHUNKS with an outer
            # checkpoint per chunk, per-layer checkpoint inside — the
            # backward saves only num_layers/remat_chunk residual-stream
            # boundaries instead of num_layers (at 7B/32k each boundary
            # is 235 MB; plain per-layer remat's 28 boundaries alone
            # exceed a 16 GB chip). Costs one extra chunk forward per
            # chunk backward.
            #
            # Both loops scan over layer INDICES and dynamic-index the
            # closed-over stacked weights inside the body: scanning over
            # the chunked weights themselves (xs=[n_outer, chunk, ...])
            # materializes each chunk's stacked weights as while-loop
            # operands — at 7B three s8[7,3584,18944] (453 MB) buffers,
            # ~1.4 GB of pure weight copies; and full Python unrolling
            # loses the scan's serialization, letting the scheduler keep
            # dozens of per-layer f32 temps live (measured 33.9 GB).
            # Index-scan keeps per-layer slices transient (65 MB) and
            # the graph serialized.
            layers = scan_layers
            n_outer = cfg.num_layers // remat_chunk

            def one_layer(y, idx):
                lp = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, idx, 0, keepdims=False), layers)
                y2, _ = _layer_step(cfg, attn_impl, y, lp,
                                    positions, k_pos,
                                    lora_scale=lora_scale,
                                    mlp_chunk=mlp_chunk,
                                    int4_stk=int4_stk, layer_idx=idx)
                return y2

            @jax.checkpoint
            def outer(carry, c_idx):
                def inner(y, j):
                    return jax.checkpoint(one_layer)(
                        y, c_idx * remat_chunk + j), None
                y, _ = jax.lax.scan(
                    inner, carry,
                    jnp.arange(remat_chunk, dtype=jnp.int32))
                return y, None

            x, _ = jax.lax.scan(
                outer, x, jnp.arange(n_outer, dtype=jnp.int32))
        else:
            x, _ = jax.lax.scan(
                step_fn, x,
                (scan_layers,
                 jnp.arange(cfg.num_layers, dtype=jnp.int32)))
        new_cache = None

    if logits_positions is not None:
        x = jax.vmap(lambda row, i: row[i])(x, logits_positions)[:, None]
    fn = params["final_norm"]
    x = _norm(x, fn + 1.0 if cfg.norm_offset else fn, cfg)
    if return_hidden:
        return x, new_cache
    return lm_head_logits(params, x), new_cache


def lm_head_logits(params: Params, x: jax.Array) -> jax.Array:
    """Final-normed hidden states -> vocabulary logits (f32)."""
    head = params.get("lm_head")
    head_scale = None
    if head is None:
        head = params["embed"].T
        if head.dtype == jnp.int8:
            # tied int8 embedding: per-row scales [V, 1] apply along the
            # vocab (output) axis of the logits
            head_scale = params["embed_scale"].astype(jnp.float32)[:, 0]
            head = head.astype(x.dtype)
    elif head.dtype == jnp.int8:
        head_scale = params["lm_head_scale"].astype(jnp.float32)
        head = head.astype(x.dtype)
    elif head.dtype == jnp.uint8:
        from streamvln_tpu.models.quant import dequant_int4
        from streamvln_tpu.ops.int4_matmul import (
            KERNEL_MAX_ROWS, int4_kernel_eligible, int4_matmul,
            int4_prefill_matmul)
        sc = params["lm_head_scale"]
        x2 = x.reshape(-1, x.shape[-1])
        if int4_kernel_eligible(head[None], sc[None]):
            interp = jax.default_backend() != "tpu"
            if x2.shape[0] <= KERNEL_MAX_ROWS:
                # decode-path vocab projection: at 7B the packed
                # lm_head is ~270 MB vs a ~1.1 GB materialized bf16
                # dequant — stream it through the fused kernel
                # ([1, din/2, V], layer 0)
                logits = int4_matmul(x2, head[None], sc[None],
                                     jnp.int32(0), interp)
            else:
                # prefill rows: Pallas dequant-materialize + dense dot
                logits = int4_prefill_matmul(x2, head[None], sc[None],
                                             jnp.int32(0), interp)
            return logits.reshape(*x.shape[:-1], head.shape[-1])
        head = dequant_int4(head, sc, x.dtype)
    logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if head_scale is not None:
        logits = logits * head_scale
    return logits


def embed_tokens(params: Params, input_ids: jax.Array,
                 cfg: Optional[Qwen2Config] = None) -> jax.Array:
    """Token embedding lookup; sentinel/negative ids map to zeros.
    Gemma-family configs (cfg.scale_embeddings) multiply by
    sqrt(hidden_size)."""
    safe = jnp.maximum(input_ids, 0)
    emb = jnp.take(params["embed"], safe, axis=0)
    if emb.dtype == jnp.int8:
        scale = jnp.take(params["embed_scale"], safe, axis=0)
        emb = emb.astype(scale.dtype) * scale
    if cfg is not None and cfg.scale_embeddings:
        emb = emb * jnp.asarray(cfg.hidden_size ** 0.5, emb.dtype)
    return jnp.where((input_ids >= 0)[..., None], emb, 0)
