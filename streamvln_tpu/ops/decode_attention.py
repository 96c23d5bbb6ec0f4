"""Pallas GQA decode attention over the KV ring buffer.

The north-star streaming kernel (BASELINE.json): single-token decode
attention reading the per-env HBM KV cache. Why a kernel instead of the
dense XLA path: the cache buffer has fixed capacity (e.g. 4096) but only
`length` slots are live (typically a third of capacity mid-window);
XLA's dense path streams the WHOLE buffer through the VPU every decode
step. Here K/V stay in HBM and the kernel DMAs only blocks below
`length` (double-buffered), fusing mask+online-softmax+PV into VMEM —
decode HBM traffic scales with the live window, not the capacity.

Layout: q [B, Hkv, G, D] (query heads grouped per KV head, G padded to
a sublane multiple on the host side), cache k/v [B, Hkv, Smax, D]
(KV-head-major so the DMA slices only the tiled (Smax, D) dims),
lengths [B] via scalar prefetch. Grid (B, Hkv).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_K = 512


def _decode_kernel(lengths_ref,                     # scalar prefetch [B]
                   q_ref,                           # [1, 1, G, D] VMEM
                   k_hbm, v_hbm,                    # [B, Hkv, Smax, D] HBM
                   o_ref,                           # [1, 1, G, D] VMEM
                   k_buf, v_buf, sem,               # scratch
                   *, scale: float, block_k: int, smax: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, block_k)

    q = q_ref[0, 0].astype(jnp.float32)             # [G, D]
    G, D = q.shape

    def dma(slot, j):
        kd = pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(j * block_k, block_k), :],
            k_buf.at[slot], sem.at[slot, 0])
        vd = pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(j * block_k, block_k), :],
            v_buf.at[slot], sem.at[slot, 1])
        return kd, vd

    @pl.when(n_blocks > 0)
    def _start():
        kd, vd = dma(0, 0)
        kd.start()
        vd.start()

    def body(j, carry):
        m, l, acc = carry
        slot = j % 2

        @pl.when(j + 1 < n_blocks)
        def _prefetch():
            kd, vd = dma((j + 1) % 2, j + 1)
            kd.start()
            vd.start()

        kd, vd = dma(slot, j)
        kd.wait()
        vd.wait()

        k = k_buf[slot].astype(jnp.float32)          # [BK, D]
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G, BK]
        pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        s = jnp.where(pos < length, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [G, D]
        return (m_new, l_new, acc * alpha + pv)

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_k", "interpret"))
def decode_attention(
    q: jax.Array,          # [B, 1, Hq, D] single-token queries
    k: jax.Array,          # [B, Hkv, Smax, D] cache buffer (KV-major)
    v: jax.Array,
    lengths: jax.Array,    # [B] live lengths (keys 0..len-1 visible)
    scale: Optional[float] = None,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, 1, Hq, D]."""
    B, S1, Hq, D = q.shape
    assert S1 == 1
    _, Hkv, Smax, _ = k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    bk = min(block_k, Smax)
    assert Smax % bk == 0, (Smax, bk)
    # pad the query-head group dim to a sublane-friendly multiple of 8
    G_pad = max(8, -(-G // 8) * 8)
    qg = q.reshape(B, Hkv, G, D) if Hkv * G == Hq else None
    qg = q[:, 0].reshape(B, Hkv, G, D)
    if G_pad != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G_pad - G), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G_pad, D), lambda b, h, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, G_pad, D),
                               lambda b, h, L: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bk, D), jnp.float32
                       if k.dtype == jnp.float32 else k.dtype),
            pltpu.VMEM((2, bk, D), jnp.float32
                       if v.dtype == jnp.float32 else v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_decode_kernel, scale=scale, block_k=bk,
                               smax=Smax)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G_pad, D), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qg, k, v)

    out = out[:, :, :G].reshape(B, 1, Hq, D)
    return out
