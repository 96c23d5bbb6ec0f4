"""Pallas TPU flash attention (forward) with GQA + position-based masking.

Replaces the reference's flash-attn 2 CUDA kernels
(reference: streamvln_eval.py:526, args.py:128, modeling_llama.py:51-53).

Layout: q [B, Sq, Hq, D], k/v [B, Sk, Hkv, D] (framework-wide layout);
the wrapper transposes to [B, H, S, D] for the kernel.

Masking model: visibility of key j to query i is `k_pos[j] <= q_pos[i]`.
- causal self-attention: q_pos = k_pos = arange(S)
- KV-cache prefill at offset: q_pos = offset + arange(S), k_pos = arange
  over the cache, with INVALID (unwritten / padding) keys given a large
  sentinel position so they are never visible
- per-row padding: same sentinel trick

The kernel is a standard blockwise online-softmax: grid (B, Hq, nQ, nK)
with the K axis innermost; running max/denominator/accumulator live in
VMEM scratch that persists across the sequential K iterations on a core.
Blocks fully above the causal diagonal are skipped via @pl.when.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
INVALID_POS = 1 << 30

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def shapes_supported(q, k, v) -> bool:
    """Kernel constraints: head_dim 128-aligned, seq dims block-divisible
    after padding (the wrapper pads), GQA divisibility."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, Dk = k.shape
    return (D == Dk and D % 128 == 0 and Hq % Hkv == 0)


def _flash_kernel(q_pos_ref, k_pos_ref,       # scalar-prefetch-like inputs
                  q_ref, k_ref, v_ref,        # [BQ, D], [BK, D], [BK, D]
                  o_ref,                      # [BQ, D]
                  m_scratch, l_scratch, acc_scratch,
                  *, scale: float, n_k: int,
                  soft_cap: Optional[float]):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_pos = q_pos_ref[0, :]                  # [BQ]
    k_pos = k_pos_ref[0, :]                  # [BK]
    # skip blocks where no key is visible to any query
    block_visible = jnp.min(k_pos) <= jnp.max(q_pos)

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        if soft_cap is not None:
            s = jnp.tanh(s / soft_cap) * soft_cap
        mask = k_pos[None, :] <= q_pos[:, None]
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:]                       # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                      # [BQ, BK]
        alpha = jnp.exp(m_prev - m_new)             # [BQ, 1]
        l_new = alpha * l_scratch[:] + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [BQ, D]
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    @pl.when(ik == n_k - 1)
    def _finalize():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "logits_soft_cap", "block_q", "block_k",
                     "interpret", "kv_major"))
def flash_attention(
    q: jax.Array,                 # [B, Sq, Hq, D]
    k: jax.Array,                 # [B, Sk, Hkv, D] (or [B, Hkv, Sk, D]
    #                               when kv_major=True — cache layout)
    v: jax.Array,
    q_positions: Optional[jax.Array] = None,   # [B, Sq] int32
    k_positions: Optional[jax.Array] = None,   # [B, Sk] int32
    mask: Optional[jax.Array] = None,          # unsupported; use positions
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    kv_major: bool = False,
) -> jax.Array:
    """Causal-by-position flash attention. Defaults to plain causal."""
    if mask is not None:
        raise NotImplementedError(
            "flash kernel takes q_positions/k_positions, not a dense mask")
    if kv_major:
        # cache layout [B, Hkv, Sk, D] is already kernel layout
        pass
    B, Sq, Hq, D = q.shape
    if kv_major:
        _, Hkv, Sk, _ = k.shape
    else:
        _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    if q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(Sq, dtype=jnp.int32)[None], (B, Sq))
    if k_positions is None:
        k_positions = jnp.broadcast_to(
            jnp.arange(Sk, dtype=jnp.int32)[None], (B, Sk))

    bq = min(block_q, Sq)
    bk = min(block_k, Sk)
    # pad sequences up to block multiples; padded queries get their last
    # real position (harmless), padded keys get INVALID_POS
    pad_q = (-Sq) % bq
    pad_k = (-Sk) % bk
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, pad_q)))
    if pad_k:
        seq_axis = 2 if kv_major else 1
        padding = [(0, 0)] * 4
        padding[seq_axis] = (0, pad_k)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        k_positions = jnp.pad(k_positions, ((0, 0), (0, pad_k)),
                              constant_values=INVALID_POS)
    Sq_p, Sk_p = Sq + pad_q, Sk + pad_k
    n_q, n_k = Sq_p // bq, Sk_p // bk

    # kernel layout [B, H, S, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k if kv_major else k.transpose(0, 2, 1, 3)
    vt = v if kv_major else v.transpose(0, 2, 1, 3)

    grid = (B, Hq, n_q, n_k)

    kernel = functools.partial(
        _flash_kernel, scale=scale, n_k=n_k, soft_cap=logits_soft_cap)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq), lambda b, h, iq, ik: (b, iq),
                         memory_space=pltpu.VMEM),     # q_pos
            pl.BlockSpec((1, bk), lambda b, h, iq, ik: (b, ik),
                         memory_space=pltpu.VMEM),     # k_pos
            pl.BlockSpec((1, 1, bq, D),
                         lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, iq, ik: (b, h // G, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, iq, ik: (b, h // G, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(q_positions, k_positions, qt, kt, vt)

    out = out.transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :Sq]
    return out
