"""Attention: dense XLA reference + dispatch to Pallas kernels.

The dense path is the numerical ground truth every Pallas kernel is tested
against, and the fallback on CPU. Layouts are [B, S, H, D] throughout.

GQA (Qwen2-7B: 28 q heads / 4 kv heads) is handled by folding query heads
into groups over the kv heads — never by materialising repeated K/V
(the reference's flash-attn path does the same under the hood; the HF dense
path repeat-interleaves, which wastes HBM bandwidth).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite; avoids NaN from (-inf) - (-inf) rows


def dense_attention(
    q: jax.Array,            # [B, Sq, Hq, D]
    k: jax.Array,            # [B, Sk, Hkv, D]
    v: jax.Array,            # [B, Sk, Hkv, D]
    mask: Optional[jax.Array] = None,   # [B, Sq, Sk] or [B, 1, Sq, Sk] bool
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    bias: Optional[jax.Array] = None,   # [B, Hq, Sq, Sk] additive (alibi)
) -> jax.Array:
    """Reference attention. Computes softmax(q k^T * scale) v with GQA.

    Returns [B, Sq, Hq, D]. Accumulation in fp32 regardless of input dtype.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    qf = q.astype(jnp.float32).reshape(B, Sq, Hkv, G, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, Hkv, G, Sq, Sk]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32).reshape(
            bias.shape[0], Hkv, G, *bias.shape[2:])
    if logits_soft_cap is not None:
        logits = jnp.tanh(logits / logits_soft_cap) * logits_soft_cap
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, None, :, :]
        elif mask.ndim == 4:  # [B, 1, Sq, Sk]
            mask = mask[:, :, None, :, :]
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def dense_attention_kvmajor(
    q: jax.Array,            # [B, Sq, Hq, D]
    k: jax.Array,            # [B, Hkv, Sk, D]  (cache layout)
    v: jax.Array,
    mask: Optional[jax.Array] = None,   # [B, Sq, Sk] bool
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    bias: Optional[jax.Array] = None,   # [B, Hq, Sq, Sk] additive (alibi)
) -> jax.Array:
    """dense_attention over KV-head-major cache buffers (no transpose).

    This is the decode hot path: k/v stay in their cache dtype and the
    MXU accumulates in fp32 (`preferred_element_type`) — casting the
    cache to fp32 up front would materialize a 2x-sized copy of the
    whole capacity in HBM every step (measured ~4x cache traffic).
    """
    B, Sq, Hq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    qf = q.astype(k.dtype).reshape(B, Sq, Hkv, G, D)
    logits = jnp.einsum("bqhgd,bhkd->bhgqk", qf, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32).reshape(
            bias.shape[0], Hkv, G, *bias.shape[2:])
    if logits_soft_cap is not None:
        logits = jnp.tanh(logits / logits_soft_cap) * logits_soft_cap
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def make_causal_mask(
    q_positions: jax.Array,   # [B, Sq] global positions of queries
    k_positions: jax.Array,   # [Sk] or [B, Sk] global positions of keys
    k_valid: Optional[jax.Array] = None,  # [B, Sk] bool
) -> jax.Array:
    """mask[b, i, j] = key j visible to query i (causal + validity)."""
    if k_positions.ndim == 1:
        k_positions = k_positions[None, :]
    mask = k_positions[:, None, :] <= q_positions[:, :, None]
    if k_valid is not None:
        mask = mask & k_valid[:, None, :]
    return mask


def make_segment_causal_mask(
    segment_ids: jax.Array,   # [B, S] int; 0 = padding
) -> jax.Array:
    """Causal mask restricted to equal segment ids (packed training)."""
    S = segment_ids.shape[-1]
    same = segment_ids[:, :, None] == segment_ids[:, None, :]
    valid = (segment_ids != 0)
    causal = jnp.tril(jnp.ones((S, S), dtype=bool))
    return same & causal[None] & valid[:, :, None] & valid[:, None, :]


def mha_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    """Dispatch point: 'dense' | 'flash' | 'auto'.

    'auto' uses the Pallas flash kernel on TPU when shapes qualify
    (replaces the reference's flash-attn 2 CUDA dependency,
    reference: streamvln_eval.py:526, args.py:128), otherwise dense XLA.
    """
    if impl == "dense":
        return dense_attention(q, k, v, mask, scale, logits_soft_cap)
    if impl in ("flash", "auto"):
        from streamvln_tpu.ops import flash_attention as fa
        use_flash = fa.shapes_supported(q, k, v) and (
            impl == "flash" or jax.default_backend() == "tpu")
        if use_flash:
            return fa.flash_attention(
                q, k, v, mask=mask, scale=scale,
                logits_soft_cap=logits_soft_cap)
        if impl == "flash":
            raise NotImplementedError(
                f"flash kernel does not support shapes q={q.shape} "
                f"k={k.shape}")
    return dense_attention(q, k, v, mask, scale, logits_soft_cap)
