"""Fused int4-dequant matmul Pallas kernel — the decode bandwidth play.

Decode at small batch is weight-bandwidth-bound (docs/decode_roofline.md:
the 7B stream IS the token latency). int4 storage halves the bytes per
token vs int8, but XLA cannot fuse the nibble unpack (shift/mask/
interleave) into a dot operand the way it fuses a plain int8->bf16
convert — the round-2 measurement showed the materialized [din, dout]
dequant making int4 decode ~10x SLOWER than int8 (PARITY.md). This
kernel closes that gap: packed uint8 nibbles stream HBM->VMEM at the
packed footprint (~0.5 B/weight), the unpack + group-scale dequant run
on the VPU in-register, and the dot hits the MXU in the compute dtype.

Reference capability: bitsandbytes 4-bit inference
(/root/reference/streamvln/streamvln_train.py:1564-1600, --bits 4),
whose CUDA kernels do exactly this fusion on GPU.

Measured design ladder on a v5e (gate/up 3584x18944, batch-8 decode
rows, amortized over layersxreps inside one jit — see PARITY round-3):
- materialized-dequant XLA path:            ~20 GB/s packed
- 256-packed-row grid blocks (k-grid dim):  143 GB/s (grid-step bound)
- THIS kernel (whole-half K block, in-kernel
  sub-chunk unpack loop):                   211 GB/s
- dequant-to-VMEM-scratch + 2 big dots:     150 GB/s (scratch roundtrip
  costs more than the saved dot issues)
- narrow-dtype unpack (i8 math) and s4 bitcast: unsupported by Mosaic.
The remaining gap to the chip's ~480 GB/s is the kernel's own
DMA+cast+dot skeleton (measured 232 GB/s with the unpack deleted), not
the unpack arithmetic (+9 us of 160 us).

Layout contract (models/quant.py::quantize_weight_int4):
- packed[r, :] byte holds w[2r] in the LOW nibble, w[2r+1] in the HIGH
  nibble (both signed, range [-7, 7]);
- scales are group-wise over the contraction dim, GROUP=64 unpacked
  rows per group == 32 packed rows (quant.INT4_GROUP).

The interleave never happens: x is split into even/odd columns once
outside the kernel (x[0::2] pairs with low nibbles, x[1::2] with high)
and the contraction is computed as xe @ lo + xo @ hi — a pure
reordering of the same sum.

Stacked-layer indexing: the whole [L, din/2, dout] parameter rides in
HBM and the layer index arrives via scalar prefetch, so calls inside
the layer scan DMA exactly one layer's blocks and never materialize a
per-layer operand copy (the failure mode that retired the ring-buffer
decode kernel, docs/decode_roofline.md).

Autodiff: custom VJP with dx = g @ dequant(W_l)^T so a frozen int4 base
under LoRA training (QLoRA shape, reference --bits 4 + --lora_enable)
differentiates; the materialized transpose only exists in the backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 64           # unpacked rows per scale group (quant.INT4_GROUP)
SUB = 256            # packed rows per in-kernel unpack sub-chunk
_BLOCK_N = 512       # dout tile
# VMEM row-tile budget: bm * half * 2 B (bf16) * 2 arrays * 2 buffers
# alongside the [half, BN] weight block; ~1 MB per x array keeps the
# total well under the ~16 MB VMEM.
_X_TILE_BYTES = 1 << 20
# Above this many rows the dequant+dot path wins (the fused kernel
# re-unpacks the weight block once per row tile; prefill is
# compute-bound and reuses a single materialized dequant instead).
# The materialization itself runs through the Pallas unpack kernel
# below — XLA's own nibble-unpack codegen is ~10x off bandwidth
# (measured 1.9 ms flat for a 34 MB packed gate/up vs ~0.25 ms
# roofline; engine-level it made int4 prefill 2x slower than int8 and
# OOM'd the 14B at warmup on i32 unpack temporaries).
KERNEL_MAX_ROWS = 128
_DQ_RB = 256         # packed rows per dequant block (= 8 scale groups)


def int4_kernel_eligible(w_packed, scales) -> bool:
    """Shapes the kernel tiles cleanly: stacked [L, din/2, dout] uint8
    with din % 512 == 0 (whole-half K blocks need the sub-chunk count
    and per-sub-chunk scale groups sublane-aligned), dout % 512 == 0,
    and standard GROUP=64 scales [L, din/64, dout]."""
    if getattr(w_packed, "dtype", None) != jnp.uint8 \
            or w_packed.ndim != 3:
        return False
    L, half, dout = w_packed.shape
    din = half * 2
    return (din % (2 * SUB) == 0 and dout % _BLOCK_N == 0
            and scales.shape == (L, din // GROUP, dout))


def _kernel(l_ref, xe_ref, xo_ref, wp_ref, sc_ref, o_ref, *,
            nsub: int, gps: int):
    n = o_ref.shape[1]
    cdt = xe_ref.dtype
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for c in range(nsub):
        pi = wp_ref[0, c * SUB:(c + 1) * SUB, :].astype(jnp.int32)
        lo = (pi << 28) >> 28                 # sign-extended low nibble
        hi = (pi << 24) >> 28                 # sign-extended high nibble
        s = sc_ref[0, c * gps:(c + 1) * gps, :]   # [gps, N] f32 scales
        srep = jnp.broadcast_to(
            s.reshape(gps, 1, n), (gps, SUB // gps, n)).reshape(SUB, n)
        wlo = (lo.astype(jnp.float32) * srep).astype(cdt)
        whi = (hi.astype(jnp.float32) * srep).astype(cdt)
        xe = xe_ref[:, c * SUB:(c + 1) * SUB]
        xo = xo_ref[:, c * SUB:(c + 1) * SUB]
        acc += jnp.dot(xe, wlo, preferred_element_type=jnp.float32)
        acc += jnp.dot(xo, whi, preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _row_tile(M: int, half: int) -> int:
    cap = max(16, _X_TILE_BYTES // (2 * half) // 16 * 16)
    return min(cap, max(16, -(-M // 16) * 16))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_fwd_impl(x, w_packed, scales, layer,
                          interpret: bool = False):
    M, din = x.shape
    L, half, dout = w_packed.shape
    assert din == 2 * half, (x.shape, w_packed.shape)
    assert int4_kernel_eligible(w_packed, scales), \
        (w_packed.shape, scales.shape)

    bm = _row_tile(M, half)
    m_pad = -(-M // bm) * bm
    xp = x if m_pad == M else jnp.pad(x, ((0, m_pad - M), (0, 0)))
    xe = xp[:, 0::2]                          # pairs with low nibbles
    xo = xp[:, 1::2]                          # pairs with high nibbles

    G = din // GROUP
    nsub = half // SUB
    gps = 2 * SUB // GROUP                    # scale groups per sub (8)
    nd, nm = dout // _BLOCK_N, m_pad // bm

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nd, nm),
        in_specs=[
            pl.BlockSpec((bm, half), lambda d, m, l: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, half), lambda d, m, l: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, _BLOCK_N),
                         lambda d, m, l: (l[0], 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, _BLOCK_N),
                         lambda d, m, l: (l[0], 0, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, _BLOCK_N),
                               lambda d, m, l: (m, d),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nsub=nsub, gps=gps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, dout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xe, xo, w_packed,
      scales)
    return out[:M]


def _dequant_kernel(l_ref, wp_ref, sc_ref, o_ref):
    rb, n = wp_ref.shape[1], wp_ref.shape[2]
    pi = wp_ref[0].astype(jnp.int32)
    lo = (pi << 28) >> 28                    # sign-extended low nibble
    hi = (pi << 24) >> 28                    # sign-extended high nibble
    s = sc_ref[0]                            # [rb/32, N] f32 group scales
    srep = jnp.broadcast_to(
        s.reshape(rb // 32, 1, n), (rb // 32, 32, n)).reshape(rb, n)
    o_ref[0] = (lo.astype(jnp.float32) * srep).astype(o_ref.dtype)
    o_ref[1] = (hi.astype(jnp.float32) * srep).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dtype", "interpret"))
def int4_dequant_split(w_packed, scales, layer, dtype=jnp.bfloat16,
                       interpret: bool = False):
    """Pallas unpack: [L, half, dout] packed u8 -> [2, half, dout]
    `dtype`, out[0] = low-nibble rows (original even rows), out[1] =
    high (odd). Runs at HBM bandwidth; pair with an even/odd column
    reorder of x (`_split_cols`) so a consumer dot sees the standard
    contraction as one big MXU call. The split layout avoids a
    sublane interleave in the kernel (strided row writes don't tile)."""
    L, half, dout = w_packed.shape
    assert int4_kernel_eligible(w_packed, scales), \
        (w_packed.shape, scales.shape)
    G = half * 2 // GROUP
    nr, nd = half // _DQ_RB, dout // _BLOCK_N
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, nd),
        in_specs=[
            pl.BlockSpec((1, _DQ_RB, _BLOCK_N),
                         lambda r, d, l: (l[0], r, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _DQ_RB // 32, _BLOCK_N),
                         lambda r, d, l: (l[0], r, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, _DQ_RB, _BLOCK_N),
                               lambda r, d, l: (0, r, d),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _dequant_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, half, dout), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), w_packed, scales)


def _split_cols(x):
    """[M, din] -> [M, din] with even columns first, odd after —
    matches int4_dequant_split's [lo-rows; hi-rows] stacking."""
    return jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=1)


def _merge_cols(x):
    """Inverse of _split_cols (used for dx in the backward)."""
    M, din = x.shape
    half = din // 2
    return jnp.stack([x[:, :half], x[:, half:]],
                     axis=-1).reshape(M, din)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def int4_prefill_matmul(x: jax.Array,         # [M, din] float rows
                        w_packed: jax.Array,  # [L, din/2, dout] uint8
                        scales: jax.Array,    # [L, din/64, dout] f32
                        layer: jax.Array,     # int32 scalar (traced ok)
                        interpret: bool = False) -> jax.Array:
    """x @ dequant(w_packed[layer]) for LARGE row counts (prefill /
    training): Pallas dequant-materialize + one dense MXU dot. The
    bf16 materialization costs ~2.5 B/weight of extra HBM traffic —
    negligible against a compute-bound dot — while the fused streaming
    kernel (int4_matmul) re-unpacks per row tile and loses above
    ~KERNEL_MAX_ROWS rows."""
    w2 = int4_dequant_split(w_packed, scales, layer, x.dtype, interpret)
    half, dout = w_packed.shape[1], w_packed.shape[2]
    return jnp.dot(_split_cols(x), w2.reshape(2 * half, dout),
                   preferred_element_type=jnp.float32)


def _pf_fwd(x, w_packed, scales, layer, interpret):
    out = int4_prefill_matmul(x, w_packed, scales, layer, interpret)
    return out, (jnp.zeros((0,), x.dtype), w_packed, scales, layer)


def _pf_bwd(interpret, res, g):
    dt_probe, w_packed, scales, layer = res
    half, dout = w_packed.shape[1], w_packed.shape[2]
    w2 = int4_dequant_split(w_packed, scales, layer, dt_probe.dtype,
                            interpret)
    dxs = jnp.dot(g.astype(dt_probe.dtype),
                  w2.reshape(2 * half, dout).T)
    return _merge_cols(dxs).astype(dt_probe.dtype), None, None, None


int4_prefill_matmul.defvjp(_pf_fwd, _pf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def int4_matmul(x: jax.Array,           # [M, din] float rows
                w_packed: jax.Array,    # [L, din/2, dout] uint8
                scales: jax.Array,      # [L, din/64, dout] f32
                layer: jax.Array,       # int32 scalar (traced ok)
                interpret: bool = False) -> jax.Array:
    """x @ dequant(w_packed[layer]) -> f32 [M, dout].

    The dot runs in x.dtype on the MXU with f32 accumulation; the HBM
    read of the weight stays at the packed 0.5 B/weight."""
    return _int4_matmul_fwd_impl(x, w_packed, scales, layer,
                                 interpret=interpret)


def _fwd(x, w_packed, scales, layer, interpret):
    out = _int4_matmul_fwd_impl(x, w_packed, scales, layer,
                                interpret=interpret)
    # zero-size sentinel keeps x's dtype in the residuals (dtypes are
    # not pytree leaves)
    return out, (jnp.zeros((0,), x.dtype), w_packed, scales, layer)


def _bwd(interpret, res, g):
    from streamvln_tpu.models.quant import dequant_int4
    dt_probe, w_packed, scales, layer = res
    dtype = dt_probe.dtype
    wl = jax.lax.dynamic_index_in_dim(w_packed, layer, 0,
                                      keepdims=False)
    sl = jax.lax.dynamic_index_in_dim(scales, layer, 0, keepdims=False)
    w = dequant_int4(wl, sl, jnp.float32)     # [din, dout], bwd only
    dx = jnp.dot(g, w.T).astype(dtype)
    return dx, None, None, None


int4_matmul.defvjp(_fwd, _bwd)
