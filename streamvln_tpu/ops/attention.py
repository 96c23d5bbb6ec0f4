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
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, Sk] (int8 cache)
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """dense_attention over KV-head-major cache buffers (no transpose).

    This is the decode hot path: k/v stay in their cache dtype and the
    MXU accumulates in fp32 (`preferred_element_type`) — casting the
    cache to fp32 up front would materialize a 2x-sized copy of the
    whole capacity in HBM every step (measured ~4x cache traffic).

    int8 cache (k_scale/v_scale given): the per-(head, position)
    dequant scales COMMUTE out of both matmuls — k's scale multiplies
    the logits along Sk, v's folds into the probabilities — so the
    int8 buffers feed the MXU directly (int8 values are exact in bf16;
    the convert rides the operand stream) and no dequantized
    cache-sized temp is ever materialized. Also slightly MORE accurate
    than dequant-then-matmul: the scale is applied in f32 after
    accumulation instead of rounding k*scale to bf16 per element.
    """
    B, Sq, Hq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    cdt = q.dtype
    qf = (q if k_scale is not None else q.astype(k.dtype)) \
        .reshape(B, Sq, Hkv, G, D)
    logits = jnp.einsum("bqhgd,bhkd->bhgqk", qf,
                        k.astype(cdt) if k_scale is not None else k,
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, None, :]
    if bias is not None:
        logits = logits + bias.astype(jnp.float32).reshape(
            bias.shape[0], Hkv, G, *bias.shape[2:])
    if logits_soft_cap is not None:
        logits = jnp.tanh(logits / logits_soft_cap) * logits_soft_cap
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        pv = (probs * v_scale[:, :, None, None, :]).astype(cdt)
        out = jnp.einsum("bhgqk,bhkd->bqhgd", pv, v.astype(cdt),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhgqk,bhkd->bqhgd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def dense_attention_kvmajor_2src(
    q: jax.Array,             # [B, Sq, Hq, D]
    k1: jax.Array,            # [B, Hkv, S1, D] big cache (read-only)
    v1: jax.Array,
    mask1: jax.Array,         # [B, Sq, S1] bool
    k2: jax.Array,            # [B, Hkv, S2, D] loop scratch
    v2: jax.Array,
    mask2: jax.Array,         # [B, Sq, S2] bool
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    bias1: Optional[jax.Array] = None,   # [B, Hq, Sq, S1] (alibi)
    bias2: Optional[jax.Array] = None,
    kv_scales1: Optional[tuple] = None,  # (k_scale, v_scale) [B,Hkv,S1]
    kv_scales2: Optional[tuple] = None,
) -> jax.Array:
    """dense_attention_kvmajor over TWO kv sources under ONE softmax.

    The decode-loop hot path (streaming/engine.py): the big KV cache
    stays LOOP-INVARIANT (source 1, read-only) while the current call's
    tokens accumulate in a tiny scratch buffer (source 2) — appending
    into the full cache inside a while-loop makes XLA carry a second,
    S-untiled relayout copy of the whole capacity across iterations
    (docs/decode_roofline.md, "in-loop relayout copies": 2x cache HBM,
    the 14B batched-8 OOM). Scores for both sources are concatenated
    before the softmax, so the result equals single-source attention
    over the concatenated keys exactly, up to the f32 summation
    grouping of the output matmul (out = p1@v1 + p2@v2).

    int8 sources (kv_scales given) fold their dequant scales into the
    logits/probabilities exactly as dense_attention_kvmajor does.
    """
    B, Sq, Hq, D = q.shape
    _, Hkv, S1, _ = k1.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    cdt = q.dtype

    def logits_for(k, k_scale, mask, bias):
        qf = (q if k_scale is not None else q.astype(k.dtype)) \
            .reshape(B, Sq, Hkv, G, D)
        lg = jnp.einsum("bqhgd,bhkd->bhgqk", qf,
                        k.astype(cdt) if k_scale is not None else k,
                        preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            lg = lg * k_scale[:, :, None, None, :]
        if bias is not None:
            lg = lg + bias.astype(jnp.float32).reshape(
                bias.shape[0], Hkv, G, *bias.shape[2:])
        if logits_soft_cap is not None:
            lg = jnp.tanh(lg / logits_soft_cap) * logits_soft_cap
        return jnp.where(mask[:, None, None, :, :], lg, NEG_INF)

    ks1, vs1 = kv_scales1 if kv_scales1 is not None else (None, None)
    ks2, vs2 = kv_scales2 if kv_scales2 is not None else (None, None)
    lg = jnp.concatenate([logits_for(k1, ks1, mask1, bias1),
                          logits_for(k2, ks2, mask2, bias2)], axis=-1)
    probs = jax.nn.softmax(lg, axis=-1)
    p1, p2 = probs[..., :S1], probs[..., S1:]

    def out_for(p, v, v_scale):
        if v_scale is not None:
            p = (p * v_scale[:, :, None, None, :]).astype(cdt)
            v = v.astype(cdt)
        else:
            p = p.astype(v.dtype)
        return jnp.einsum("bhgqk,bhkd->bqhgd", p, v,
                          preferred_element_type=jnp.float32)

    out = out_for(p1, v1, vs1) + out_for(p2, v2, vs2)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def chunked_attention(
    q: jax.Array,            # [B, Sq, Hq, D]
    k: jax.Array,            # [B, Sk, Hkv, D]
    v: jax.Array,            # [B, Sk, Hkv, D]
    q_pos: jax.Array,        # [B, Sq] global query positions
    k_pos: jax.Array,        # [B, Sk] key positions (invalid = huge)
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    q_block: int = 2048,
    k_block: int = 8192,
) -> jax.Array:
    """Flash-attention algorithm in plain XLA: lax.scan over query
    blocks, inner scan over key blocks with online softmax. Peak memory
    is O(q_block * k_block) per head group instead of O(Sq * Sk), so
    32k-context training fits where the dense path would materialize a
    4 GB score tensor per head. Visibility rule identical to
    dense_attention: key j visible to query i iff k_pos[j] <= q_pos[i]
    (invalid keys carry INVALID_POS). Numerics: fp32 accumulation;
    equal to dense up to fp32 summation-order rounding.

    Used as the long-context fallback where the Pallas flash kernel is
    unavailable (CPU CI; shapes the kernel rejects). The reference's
    equivalent capability is flash-attn 2's 32k training path
    (scripts/streamvln_train_slurm.sh:68, args.py:128). Default blocks
    are sized for few scan iterations (CPU dispatch overhead dominates
    small blocks); shrink them if the per-block score tensor
    (q_block * k_block * heads * 4B) presses on device memory.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    pad_q = (-Sq) % q_block
    pad_k = (-Sk) % k_block
    qf = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, pad_q), (0, 0),
                                         (0, 0)))
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, pad_k), (0, 0),
                                         (0, 0)))
    vf = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, pad_k), (0, 0),
                                         (0, 0)))
    # padded queries see nothing real (pos -1 < all real k_pos >= 0 ...
    # actually -1 admits no keys since k_pos >= 0); padded keys are
    # invisible to everyone (INVALID_POS)
    qp = jnp.pad(q_pos, ((0, 0), (0, pad_q)), constant_values=-1)
    kp = jnp.pad(k_pos, ((0, 0), (0, pad_k)),
                 constant_values=jnp.int32(1 << 30))
    nq, nk = (Sq + pad_q) // q_block, (Sk + pad_k) // k_block

    # [nq, B, q_block, Hkv, G, D] query blocks; K/V stay whole
    qb = qf.reshape(B, nq, q_block, Hkv, G, D).transpose(1, 0, 2, 3, 4, 5)
    qpb = qp.reshape(B, nq, q_block).transpose(1, 0, 2)
    kb = kf.reshape(B, nk, k_block, Hkv, D).transpose(1, 0, 2, 3, 4)
    vb = vf.reshape(B, nk, k_block, Hkv, D).transpose(1, 0, 2, 3, 4)
    kpb = kp.reshape(B, nk, k_block).transpose(1, 0, 2)

    def per_q_block(_, qblk):
        qi, qpi = qblk        # [B, q_block, Hkv, G, D], [B, q_block]

        def per_k_block(carry, kblk):
            m, l, acc = carry
            ki, vi, kpi = kblk
            logits = jnp.einsum("bqhgd,bkhd->bhgqk", qi, ki) * scale
            if logits_soft_cap is not None:
                logits = jnp.tanh(logits / logits_soft_cap) \
                    * logits_soft_cap
            mask = kpi[:, None, :] <= qpi[:, :, None]   # [B, q, k]
            logits = jnp.where(mask[:, None, None, :, :], logits,
                               NEG_INF)
            m_new = jnp.maximum(m, logits.max(axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_new = l * alpha + p.sum(axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "bhgqk,bkhd->bhgqd", p, vi)
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, Hkv, G, q_block), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, Hkv, G, q_block), jnp.float32)
        a0 = jnp.zeros((B, Hkv, G, q_block, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(per_k_block, (m0, l0, a0),
                                      (kb, vb, kpb))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return None, out.transpose(0, 3, 1, 2, 4)  # [B, q_block, Hkv, G, D]

    _, outs = jax.lax.scan(per_q_block, None, (qb, qpb))
    out = outs.transpose(1, 0, 2, 3, 4, 5).reshape(
        B, Sq + pad_q, Hq, D)[:, :Sq]
    return out.astype(q.dtype)


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
    interpret: bool = False,   # Pallas interpret mode (CPU kernel tests)
) -> jax.Array:
    """Dispatch point: 'dense' | 'flash' | 'auto'.

    'auto' uses the Pallas flash kernel on TPU when shapes qualify
    (replaces the reference's flash-attn 2 CUDA dependency,
    reference: streamvln_eval.py:526, args.py:128), otherwise dense XLA.
    """
    if impl == "dense":
        return dense_attention(q, k, v, mask, scale, logits_soft_cap)
    if (impl in ("auto", "vit") and mask is None
            and logits_soft_cap is None
            and q.shape[1] == k.shape[1] and q.shape[3] <= 128
            and q.shape[2] == k.shape[2] and q.shape[1] <= 1024
            and (impl == "vit" or jax.default_backend() == "tpu")):
        # encoder shapes (full attention, short seq): the whole score
        # matrix fits VMEM — one-shot kernel, no HBM score traffic.
        # Measured at SigLIP batch-32 shapes on v5e-1: 8.7 vs 14.6 ms
        # per layer vs dense (ops/vit_attention.py).
        from streamvln_tpu.ops.vit_attention import vit_attention
        return vit_attention(q, k, v, scale=scale, interpret=interpret)
    if impl in ("flash", "auto"):
        from streamvln_tpu.ops import flash_attention as fa
        # mha_attention is the ENCODER entry: attention here is FULL
        # (bidirectional). The kernel is causal-by-position, so full
        # attention = every key at position 0 (0 <= any query pos).
        # NOT auto-dispatched: measured on v5e-1 at SigLIP shapes
        # (S=729, D=72 zero-padded to 128) the kernel LOSES to dense
        # XLA — 95 vs 119 frames/s at batch 32; the 128/72 padded-
        # matmul overhead exceeds the [H,S,S] logits-materialization
        # saving at these sizes. Explicit impl="flash" only (the win
        # case is much longer encoder sequences, e.g. S2 multi-scale).
        use_flash = (mask is None and impl == "flash"
                     and fa.shapes_supported(q, k, v))
        if use_flash:
            B, Sq = q.shape[:2]
            kp = jnp.zeros((B, k.shape[1]), jnp.int32)
            qp = jnp.zeros((B, Sq), jnp.int32)
            return fa.flash_attention(
                q, k, v, q_positions=qp, k_positions=kp, scale=scale,
                logits_soft_cap=logits_soft_cap, interpret=interpret)
        if impl == "flash" and mask is None:
            raise NotImplementedError(
                f"flash kernel does not support shapes q={q.shape} "
                f"k={k.shape}")
    return dense_attention(q, k, v, mask, scale, logits_soft_cap)
