"""Whole-sequence bidirectional attention kernel for ViT towers.

The encoder towers (SigLIP 729 tokens x 72 head dim, CLIP 64) run FULL
attention over short sequences. Dense XLA materializes the f32 logits
in HBM — at SigLIP/batch-32 that is 16 heads x 729^2 x 4 B ~ 34 MB per
frame-layer, ~3-4 round-trips x 26 layers ~ 100 GB of score traffic per
encode batch, which caps the tower at ~40% MFU. The generic flash
kernel doesn't help here: its online-softmax block machinery (and the
q/k position plumbing) costs more than it saves at S=729 (measured
95 vs 119 frames/s).

This kernel exploits the actual shape: the WHOLE score matrix for one
(batch, head) fits VMEM (768^2 f32 = 2.4 MB), so each grid cell does
  scores = q @ k^T -> plain softmax -> @ v
with zero HBM traffic for the scores and no online-softmax passes.
Head dims are zero-padded to the 128 lane width (exact); sequences pad
to a multiple of 8 sublanes in the S dim and 128 lanes in the score
lane dim, with padded keys masked to -inf.

Reference capability: flash-attn 2 inside the vision tower
(llava's SigLipAttention uses torch SDPA; reference
llava/model/multimodal_encoder/siglip_encoder.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_real: int):
    q = q_ref[0, 0]                               # [Sp, Dp]
    k = k_ref[0, 0]
    # bf16 inputs stay bf16 into the dot: the MXU multiplies bf16
    # pairs into an f32 accumulator natively, so bf16 x bf16 with
    # preferred f32 is BIT-IDENTICAL to first upcasting the same
    # bf16 values to f32 — but one MXU pass instead of the multi-pass
    # f32 product. f32 inputs keep full-precision math (parity tests).
    lowp = q.dtype == jnp.bfloat16
    if not lowp:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask padded keys (zero-padded D columns already contribute 0)
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < s_real, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    # deferred normalization: scale the [Sp, Dp] output by the
    # reciprocal row sum instead of dividing the [Sp, Sp] probability
    # matrix — Sp/Dp x less VPU divide traffic, same value up to f32
    # rounding.
    r = 1.0 / jnp.sum(p, axis=1, keepdims=True)   # [Sp, 1]
    v = v_ref[0, 0]
    if lowp:
        # max-subtracted p lies in [0, 1] — a comfortable bf16 range;
        # the PV product accumulates in f32 on the MXU and the output
        # rounds to bf16 regardless (flash-attn semantics).
        p = p.astype(jnp.bfloat16)
    else:
        v = v.astype(jnp.float32)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o * r).astype(o_ref.dtype)


def _reference(q, k, v, scale):
    """Plain-XLA math of the kernel (f32 softmax over the full score
    matrix) — the VJP recomputation target. Encoder sequences are short,
    so the dense backward is what training always ran pre-kernel."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _vit_attention(q, k, v, scale: float, interpret: bool):
    return _vit_attention_fwd(q, k, v, scale, interpret)[0]


def _vit_attention_fwd(q, k, v, scale, interpret):
    return _vit_attention_impl(q, k, v, scale=scale,
                               interpret=interpret), (q, k, v)


def _vit_attention_bwd(scale, interpret, res, g):
    # backward = dense recompute: the whole-sequence forward kernel has
    # no gradient rule; encoder attention trained through dense XLA
    # before the kernel existed and the bwd FLOPs are prefill-class
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_vit_attention.defvjp(_vit_attention_fwd, _vit_attention_bwd)


def vit_attention(q: jax.Array,      # [B, S, H, D]
                  k: jax.Array,
                  v: jax.Array,
                  scale: Optional[float] = None,
                  interpret: bool = False) -> jax.Array:
    """Full (bidirectional) MHA for encoder shapes. Exact vs
    dense_attention up to f32 summation order. Differentiable: the
    forward runs the VMEM kernel, the backward recomputes through the
    equivalent dense math (custom VJP)."""
    if scale is None:
        scale = q.shape[3] ** -0.5
    return _vit_attention(q, k, v, float(scale), interpret)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret"))
def _vit_attention_impl(q: jax.Array,      # [B, S, H, D]
                        k: jax.Array,
                        v: jax.Array,
                        scale: float,
                        interpret: bool = False) -> jax.Array:
    B, S, H, D = q.shape
    # S pads to the score LANE width (128) so the [Sp, Sp] score block
    # tiles; D pads to 128 lanes for the q/k/v blocks.
    Sp = -(-S // 128) * 128
    Dp = -(-D // 128) * 128

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3)            # [B, H, Sp, Dp]

    qt, kt, vt = prep(q), prep(k), prep(v)
    spec = pl.BlockSpec((1, 1, Sp, Dp), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), s_real=S),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)[:, :S, :, :D]
