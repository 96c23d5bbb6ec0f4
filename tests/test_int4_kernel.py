"""Fused int4 dequant-matmul kernel (ops/int4_matmul.py): interpret-mode
exactness vs the materialized dequant, layer indexing, VJP, and the
forward()-level stacked-kernel dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.models import qwen2, quant
from streamvln_tpu.ops.int4_matmul import (
    KERNEL_MAX_ROWS, int4_kernel_eligible, int4_matmul)


def _mk(l=2, din=512, dout=512, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray((rng.randn(l, din, dout) * 0.02).astype(np.float32))
    wp, sc = quant.quantize_weight_int4(w)
    return w, wp, sc


@pytest.mark.parametrize("m", [1, 8, 20])
def test_kernel_matches_dequant_exactly(m):
    w, wp, sc = _mk()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(m, 512).astype(np.float32))
    for layer in (0, 1):
        ref = x @ quant.dequant_int4(wp[layer], sc[layer], jnp.float32)
        out = int4_matmul(x, wp, sc, jnp.int32(layer), True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_kernel_eligibility():
    _, wp, sc = _mk()
    assert int4_kernel_eligible(wp, sc)
    # din not a 512 multiple
    _, wp2, sc2 = _mk(din=256)
    assert not int4_kernel_eligible(wp2, sc2)
    # dout not a 512 multiple
    _, wp3, sc3 = _mk(dout=384)
    assert not int4_kernel_eligible(wp3, sc3)
    assert not int4_kernel_eligible(wp[0], sc[0])     # unstacked


def test_kernel_vjp_matches_dequant_grad():
    """Frozen int4 base under LoRA training: dx flows through the
    custom VJP (dequant transpose in the backward only)."""
    w, wp, sc = _mk()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 512).astype(np.float32))

    def f_kernel(x):
        return int4_matmul(x, wp, sc, jnp.int32(1), True).sum()

    def f_ref(x):
        wd = quant.dequant_int4(wp[1], sc[1], jnp.float32)
        return (x @ wd).sum()

    g = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-5, atol=2e-5)


def _eligible_cfg():
    from streamvln_tpu.configs import Qwen2Config
    return Qwen2Config(
        vocab_size=512, hidden_size=512, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=128,
        max_position_embeddings=128)


def test_forward_dispatches_stacked_kernel():
    """quantize_llm(bits=4) weights at kernel-eligible shapes: the
    layer scan pulls the packed stacks out of xs and the kernel path
    matches the materialized-dequant forward."""
    cfg = _eligible_cfg()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    q4 = quant.quantize_llm({"llm": params}, bits=4)["llm"]
    scan_layers, stk = qwen2._split_int4_stacks(q4["layers"])
    assert stk is not None
    for name in qwen2._INT4_KERNEL_NAMES:
        if name in q4["layers"]:      # fused names absent when unfused
            assert name in stk and name not in scan_layers

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 512),
                          jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8)[None], (2, 8))
    out, _ = qwen2.forward(q4, cfg, x, pos, attn_impl="dense")

    dq = quant.dequantize_llm({"llm": q4})["llm"]
    ref, _ = qwen2.forward(dq, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_kernel_decode_with_cache():
    """Cache-path (decode) scan also dispatches the kernel and agrees
    with the dequantized model token-for-token."""
    cfg = _eligible_cfg()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    q4 = quant.quantize_llm({"llm": params}, bits=4)["llm"]
    dq = quant.dequantize_llm({"llm": q4})["llm"]

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 512),
                          jnp.float32)
    pos = jnp.arange(6)[None]
    cache_q = qwen2.KVCache.create(cfg, 1, 32, jnp.float32)
    cache_d = qwen2.KVCache.create(cfg, 1, 32, jnp.float32)
    out_q, cache_q = qwen2.forward(q4, cfg, x, pos, cache=cache_q,
                                   attn_impl="dense")
    out_d, cache_d = qwen2.forward(dq, cfg, x, pos, cache=cache_d,
                                   attn_impl="dense")
    np.testing.assert_allclose(np.asarray(out_q[:, -1]),
                               np.asarray(out_d[:, -1]),
                               rtol=2e-4, atol=2e-4)
    # one decode step
    x1 = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 512),
                           jnp.float32)
    p1 = jnp.full((1, 1), 6)
    o_q, _ = qwen2.forward(q4, cfg, x1, p1, cache=cache_q,
                           attn_impl="dense")
    o_d, _ = qwen2.forward(dq, cfg, x1, p1, cache=cache_d,
                           attn_impl="dense")
    np.testing.assert_allclose(np.asarray(o_q), np.asarray(o_d),
                               rtol=2e-4, atol=2e-4)


def test_dequant_split_matches_reference():
    """int4_dequant_split == dequant_int4 with even/odd rows regrouped
    into the [lo-rows; hi-rows] split layout."""
    from streamvln_tpu.ops.int4_matmul import int4_dequant_split
    _, wp, sc = _mk()
    for layer in (0, 1):
        ref = quant.dequant_int4(wp[layer], sc[layer], jnp.float32)
        out = np.asarray(int4_dequant_split(
            wp, sc, jnp.int32(layer), jnp.float32, True))
        np.testing.assert_allclose(out[0], np.asarray(ref[0::2]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(out[1], np.asarray(ref[1::2]),
                                   rtol=1e-6, atol=1e-6)


def test_prefill_matmul_matches_and_differentiates():
    """int4_prefill_matmul (Pallas dequant + dense dot) matches the
    materialized reference forward AND backward (QLoRA dx)."""
    from streamvln_tpu.ops.int4_matmul import int4_prefill_matmul
    _, wp, sc = _mk()
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(192, 512).astype(np.float32))

    def f_kernel(x):
        return int4_prefill_matmul(x, wp, sc, jnp.int32(1), True).sum()

    def f_ref(x):
        wd = quant.dequant_int4(wp[1], sc[1], jnp.float32)
        return (x @ wd).sum()

    out = int4_prefill_matmul(x, wp, sc, jnp.int32(1), True)
    ref = x @ quant.dequant_int4(wp[1], sc[1], jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=2e-5, atol=2e-5)


def test_large_rows_use_dequant_kernel_path():
    """Above KERNEL_MAX_ROWS the _proj dispatch uses the Pallas
    dequant-materialize + dense-dot path — results still match."""
    cfg = _eligible_cfg()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    q4 = quant.quantize_llm({"llm": params}, bits=4)["llm"]
    dq = quant.dequantize_llm({"llm": q4})["llm"]
    S = KERNEL_MAX_ROWS + 8
    x = jax.random.normal(jax.random.PRNGKey(4), (1, S, 512),
                          jnp.float32)
    pos = jnp.arange(S)[None]
    out, _ = qwen2.forward(q4, cfg, x, pos, attn_impl="dense")
    ref, _ = qwen2.forward(dq, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_qwen2_14b_all_projections_kernel_eligible():
    """The 14B capacity config exists BECAUSE of the int4 kernel: every
    projection (and the lm_head) must tile cleanly (512-multiples)."""
    from streamvln_tpu.configs import qwen2_14b
    cfg = qwen2_14b()
    dims = [
        (cfg.hidden_size, cfg.num_heads * cfg.head_dim),          # q
        (cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim),       # k/v
        (cfg.num_heads * cfg.head_dim, cfg.hidden_size),          # o
        (cfg.hidden_size, cfg.intermediate_size),                 # gate/up
        (cfg.intermediate_size, cfg.hidden_size),                 # down
        (cfg.hidden_size, cfg.vocab_size),                        # lm_head
        (cfg.hidden_size,                                         # fused qkv
         (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim),
        (cfg.hidden_size, 2 * cfg.intermediate_size),             # fused gu
    ]
    for din, dout in dims:
        assert din % 512 == 0 and dout % 512 == 0, (din, dout)
    # full packed footprint: per-layer q + k + v + o + gate + up + down
    # (k/v and gate/up each twice), plus lm_head and the int8 embed
    D, F = cfg.hidden_size, cfg.intermediate_size
    per_layer = (D * cfg.num_heads * cfg.head_dim          # q
                 + 2 * D * cfg.num_kv_heads * cfg.head_dim  # k, v
                 + cfg.num_heads * cfg.head_dim * D          # o
                 + 2 * D * F                                  # gate, up
                 + F * D)                                     # down
    packed = (per_layer * cfg.num_layers
              + D * cfg.vocab_size) / 2          # 0.5 B/weight
    embed = cfg.vocab_size * D                   # int8 embed, 1 B
    assert (packed + embed) / 2**30 < 12         # leaves room for KV
