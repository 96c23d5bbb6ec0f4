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
    """Kernel constraints: GQA divisibility; head dims that are not
    128-aligned are zero-padded by the wrapper (exact), so any D <= 128
    or 128-multiple-padded D qualifies. The compute overhead of the
    pad is ceil(D/128)*128/D — callers should prefer dense for tiny
    sequences where the materialized-logits saving doesn't pay."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, Dk = k.shape
    return (D == Dk and Hq % Hkv == 0)


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

    q_pos = q_pos_ref[0, 0, :]               # [BQ]
    k_pos = k_pos_ref[0, 0, :]               # [BK]
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
        # A row with no visible key anywhere keeps m == NEG_INF yet can
        # accumulate p == exp(NEG_INF - NEG_INF) == 1 mass from blocks
        # that passed the block-level visibility check; its l is then
        # > 0 and the row would emit mean(V). Force such rows to zero.
        valid = m_scratch[:] > NEG_INF / 2
        safe_l = jnp.where((l == 0.0) | ~valid, 1.0, l)
        o_ref[0, 0] = jnp.where(valid, acc_scratch[:] / safe_l,
                                0.0).astype(o_ref.dtype)


def _flash_kernel_lse(q_pos_ref, k_pos_ref, q_ref, k_ref, v_ref,
                      o_ref, lse_ref,
                      m_scratch, l_scratch, acc_scratch,
                      *, scale, n_k, soft_cap):
    """Forward + logsumexp output (training residual)."""
    _flash_kernel(q_pos_ref, k_pos_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch, scale=scale,
                  n_k=n_k, soft_cap=soft_cap)
    ik = pl.program_id(3)

    @pl.when(ik == n_k - 1)
    def _emit_lse():
        l = l_scratch[:]
        # same no-visible-key guard as _finalize: l > 0 alone is not
        # proof the row saw a real key (see comment there)
        valid = (l > 0.0) & (m_scratch[:] > NEG_INF / 2)
        lse = jnp.where(valid, m_scratch[:] + jnp.log(
            jnp.where(valid, l, 1.0)), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse[:, 0][None, :],
                                         lse_ref.shape[2:])


def _flash_bwd_dq_kernel(q_pos_ref, k_pos_ref,
                         q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                         dq_ref, dq_scratch,
                         *, scale, n_k):
    """dQ: grid (B, Hq, nQ, nK), accumulate over K blocks.
    ds = p * (dO v^T - Dsum); dq += ds @ k * scale."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q_pos = q_pos_ref[0, 0, :]
    k_pos = k_pos_ref[0, 0, :]

    @pl.when(jnp.min(k_pos) <= jnp.max(q_pos))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0, 0, :].astype(jnp.float32)[:, None]
        dsum = dsum_ref[0, 0, 0, :].astype(jnp.float32)[:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            * scale
        mask = k_pos[None, :] <= q_pos[:, None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum)
        dq_scratch[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(ik == n_k - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_pos_ref, k_pos_ref,
                          q_ref, k_ref, v_ref, do_ref, lse_ref,
                          dsum_ref,
                          dk_ref, dv_ref, dk_scratch, dv_scratch,
                          *, scale, n_q):
    """dK/dV per q-head: grid (B, Hq, nK, nQ), accumulate over Q blocks.
    dv += p^T @ dO; dk += (p * (dp - Dsum))^T @ q * scale."""
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q_pos = q_pos_ref[0, 0, :]
    k_pos = k_pos_ref[0, 0, :]

    @pl.when(jnp.min(k_pos) <= jnp.max(q_pos))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0, 0, :].astype(jnp.float32)[:, None]
        dsum = dsum_ref[0, 0, 0, :].astype(jnp.float32)[:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            * scale                                         # [bq, bk]
        mask = k_pos[None, :] <= q_pos[:, None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_scratch[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, D]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum)                                # [bq, bk]
        dk_scratch[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(iq == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


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
    # lane-pad the head dim to a 128 multiple (the ViT towers run
    # D=64/72): zero columns add zero to q.k logits and produce zero
    # output columns (sliced off) — exact. scale is computed from the
    # REAL D above.
    pad_d = (-D) % 128
    if pad_d:
        dpad = [(0, 0)] * 4
        dpad[3] = (0, pad_d)
        q = jnp.pad(q, dpad)
        k = jnp.pad(k, dpad)
        v = jnp.pad(v, dpad)
    if q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(Sq, dtype=jnp.int32)[None], (B, Sq))
    if k_positions is None:
        k_positions = jnp.broadcast_to(
            jnp.arange(Sk, dtype=jnp.int32)[None], (B, Sk))

    # TPU lane tiling needs the position-block lane dim to be a
    # multiple of 128; clamp blocks accordingly (wrapper pads sequences)
    def _block(requested, S):
        b = min(requested, max(S, 1))
        return max(-(-b // 128) * 128, 128)
    bq = _block(block_q, Sq)
    bk = _block(block_k, Sk)
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

    q_pos8 = jnp.broadcast_to(q_positions[:, None, :], (B, 8, Sq_p))
    k_pos8 = jnp.broadcast_to(k_positions[:, None, :], (B, 8, Sk_p))
    out = _flash_core(qt, kt, vt, q_pos8, k_pos8,
                      float(scale), logits_soft_cap,
                      (bq, bk, bool(interpret)))

    out = out.transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :Sq]
    if pad_d:
        out = out[..., :D]
    return out


# ---------------------------------------------------------------------------
# Differentiable core (padded, kernel layout [B, H, S, D])
# ---------------------------------------------------------------------------

def _specs(B, bq, bk, D, G):
    # TPU tiling wants (sublane, lane) block dims of (8k, 128k); small
    # per-row arrays are broadcast x8 on a sublane axis host-side so
    # their blocks tile legally for any B / Hq.
    return [
        pl.BlockSpec((1, 8, bq), lambda b, h, iq, ik: (b, 0, iq),
                     memory_space=pltpu.VMEM),     # q_pos [B, 8, Sq]
        pl.BlockSpec((1, 8, bk), lambda b, h, iq, ik: (b, 0, ik),
                     memory_space=pltpu.VMEM),     # k_pos [B, 8, Sk]
        pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),     # q
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, iq, ik: (b, h // G, ik, 0),
                     memory_space=pltpu.VMEM),     # k
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, iq, ik: (b, h // G, ik, 0),
                     memory_space=pltpu.VMEM),     # v
    ]


_DIM_SEM = ("parallel", "parallel", "parallel", "arbitrary")


def _fwd_call(qt, kt, vt, q_pos, k_pos, scale, soft_cap, blocks,
              with_lse):
    bq, bk, interpret = blocks
    B, Hq, Sq_p, D = qt.shape
    Hkv = kt.shape[1]
    G = Hq // Hkv
    n_q, n_k = Sq_p // bq, kt.shape[2] // bk
    grid = (B, Hq, n_q, n_k)
    out_specs = pl.BlockSpec((1, 1, bq, D),
                             lambda b, h, iq, ik: (b, h, iq, 0),
                             memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bq, 1), jnp.float32),
               pltpu.VMEM((bq, 1), jnp.float32),
               pltpu.VMEM((bq, D), jnp.float32)]
    params = pltpu.CompilerParams(dimension_semantics=_DIM_SEM)
    if not with_lse:
        kernel = functools.partial(_flash_kernel, scale=scale, n_k=n_k,
                                   soft_cap=soft_cap)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=_specs(B, bq, bk, D, G),
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), qt.dtype),
            scratch_shapes=scratch, compiler_params=params,
            interpret=interpret,
        )(q_pos, k_pos, qt, kt, vt), None
    kernel = functools.partial(_flash_kernel_lse, scale=scale, n_k=n_k,
                               soft_cap=soft_cap)
    out, lse = pl.pallas_call(
        kernel, grid=grid, in_specs=_specs(B, bq, bk, D, G),
        out_specs=(out_specs,
                   pl.BlockSpec((1, 1, 8, bq),
                                lambda b, h, iq, ik: (b, h, 0, iq),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, Hq, Sq_p, D), qt.dtype),
                   jax.ShapeDtypeStruct((B, Hq, 8, Sq_p),
                                        jnp.float32)),
        scratch_shapes=scratch, compiler_params=params,
        interpret=interpret,
    )(q_pos, k_pos, qt, kt, vt)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(qt, kt, vt, q_pos, k_pos, scale, soft_cap, blocks):
    out, _ = _fwd_call(qt, kt, vt, q_pos, k_pos, scale, soft_cap,
                       blocks, with_lse=False)
    return out


def _flash_core_fwd(qt, kt, vt, q_pos, k_pos, scale, soft_cap, blocks):
    if soft_cap is not None:
        raise NotImplementedError(
            "flash backward does not support logits_soft_cap")
    out, lse = _fwd_call(qt, kt, vt, q_pos, k_pos, scale, soft_cap,
                         blocks, with_lse=True)
    return out, (qt, kt, vt, q_pos, k_pos, out, lse)


def _flash_core_bwd(scale, soft_cap, blocks, res, g):
    import numpy as np
    qt, kt, vt, q_pos, k_pos, out, lse = res
    bq, bk, interpret = blocks
    B, Hq, Sq_p, D = qt.shape
    Hkv, Sk_p = kt.shape[1], kt.shape[2]
    G = Hq // Hkv
    n_q, n_k = Sq_p // bq, Sk_p // bk

    do = g.astype(jnp.float32)
    dsum = jnp.sum(do * out.astype(jnp.float32), axis=-1)  # [B,Hq,Sq_p]
    dsum = jnp.broadcast_to(dsum[:, :, None, :],
                            (B, Hq, 8, Sq_p))

    row_spec = pl.BlockSpec((1, 1, 8, bq),
                            lambda b, h, iq, ik: (b, h, 0, iq),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, 1, bq, D),
                           lambda b, h, iq, ik: (b, h, iq, 0),
                           memory_space=pltpu.VMEM)
    in_specs = _specs(B, bq, bk, D, G) + [do_spec, row_spec, row_spec]
    params = pltpu.CompilerParams(dimension_semantics=_DIM_SEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, n_k=n_k),
        grid=(B, Hq, n_q, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), qt.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=params, interpret=interpret,
    )(q_pos, k_pos, qt, kt, vt, do, lse, dsum)

    # dK/dV per Q-head: grid (B, Hq, nK, nQ); Q-block axis innermost
    dkv_in_specs = [
        pl.BlockSpec((1, 8, bq), lambda b, h, ikk, iq: (b, 0, iq),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, bk), lambda b, h, ikk, iq: (b, 0, ikk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, D), lambda b, h, ikk, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, ikk, iq: (b, h // G, ikk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, ikk, iq: (b, h // G, ikk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, D), lambda b, h, ikk, iq: (b, h, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8, bq), lambda b, h, ikk, iq: (b, h, 0, iq),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8, bq), lambda b, h, ikk, iq: (b, h, 0, iq),
                     memory_space=pltpu.VMEM),
    ]
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_q=n_q),
        grid=(B, Hq, n_k, n_q),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, ikk, iq: (b, h, ikk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, ikk, iq: (b, h, ikk, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, Hq, Sk_p, D), kt.dtype),
                   jax.ShapeDtypeStruct((B, Hq, Sk_p, D), vt.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=params, interpret=interpret,
    )(q_pos, k_pos, qt, kt, vt, do, lse, dsum)

    # sum query-head groups into KV heads
    dk = dk_h.reshape(B, Hkv, G, Sk_p, D).sum(2).astype(kt.dtype)
    dv = dv_h.reshape(B, Hkv, G, Sk_p, D).sum(2).astype(vt.dtype)

    zero_q = np.zeros(q_pos.shape, jax.dtypes.float0)
    zero_k = np.zeros(k_pos.shape, jax.dtypes.float0)
    return dq, dk, dv, zero_q, zero_k


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)
