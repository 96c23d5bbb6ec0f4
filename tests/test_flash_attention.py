"""Pallas flash attention vs dense reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.ops.attention import dense_attention
from streamvln_tpu.ops.flash_attention import (
    INVALID_POS, flash_attention)


def _ref(q, k, v, q_pos, k_pos):
    mask = k_pos[:, None, :] <= q_pos[:, :, None]
    return dense_attention(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(mask))


@pytest.mark.parametrize("Sq,Sk,Hq,Hkv", [
    (64, 64, 4, 4),      # MHA causal
    (100, 300, 4, 2),    # GQA, ragged sizes (padding path)
    (1, 256, 8, 2),      # decode-shaped
])
def test_flash_matches_dense(Sq, Sk, Hq, Hkv):
    rng = np.random.RandomState(0)
    B, D = 2, 128
    q = rng.randn(B, Sq, Hq, D).astype(np.float32)
    k = rng.randn(B, Sk, Hkv, D).astype(np.float32)
    v = rng.randn(B, Sk, Hkv, D).astype(np.float32)
    # offset queries (prefill-at-offset) + invalid key tail
    off = Sk - Sq if Sk >= Sq else 0
    q_pos = (off + np.arange(Sq))[None].repeat(B, 0).astype(np.int32)
    k_pos = np.arange(Sk)[None].repeat(B, 0).astype(np.int32)
    if Sk > 32:
        k_pos[:, -16:] = INVALID_POS

    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(k_pos),
        block_q=64, block_k=64, interpret=True)
    ref = _ref(q, k, v, q_pos, k_pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_row_with_no_visible_keys_is_finite():
    """Queries that see zero keys must output zeros, not NaN."""
    rng = np.random.RandomState(1)
    B, S, H, D = 1, 64, 2, 128
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    q_pos = np.zeros((B, S), np.int32)          # all queries at pos 0
    k_pos = np.full((B, S), INVALID_POS, np.int32)  # no key visible
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(q_pos), jnp.asarray(k_pos),
                          block_q=64, block_k=64, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_masked_row_inside_visible_block_is_zero():
    """A row with no visible key in a block OTHER rows see: its p mass
    used to be exp(NEG_INF - NEG_INF) == 1 per key -> mean(V) output.
    Must be exactly zero (matching the l == 0 safe path)."""
    rng = np.random.RandomState(2)
    B, S, H, D = 1, 64, 2, 128
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    q_pos = np.arange(S)[None].astype(np.int32)
    q_pos[:, 5] = -1                    # sees nothing (k_pos >= 0)
    k_pos = np.arange(S)[None].astype(np.int32)
    out = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(k_pos),
        block_q=64, block_k=64, interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, 5], 0.0)
    # other rows unaffected
    ref = np.asarray(_ref(q, k, v, q_pos, k_pos))
    np.testing.assert_allclose(out[:, 6:], ref[:, 6:], rtol=2e-5,
                               atol=2e-5)


def test_flash_padded_head_dim_bidirectional():
    """ViT shapes: head_dim 72 is zero-padded to 128 inside the
    wrapper (exact), and full attention == every key at position 0
    (the encoder entry mha_attention uses exactly this encoding)."""
    rng = np.random.RandomState(1)
    B, S, H, D = 2, 729, 4, 72
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    q_pos = np.zeros((B, S), np.int32)
    k_pos = np.zeros((B, S), np.int32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(k_pos),
        block_q=128, block_k=128, interpret=True)
    mask = np.ones((B, S, S), bool)
    ref = dense_attention(jnp.asarray(q), jnp.asarray(k),
                          jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mha_attention_full_equals_dense():
    """The encoder dispatch (mha_attention impl='flash') must compute
    FULL attention, not causal. (Not auto-dispatched: dense XLA
    measured faster at SigLIP sizes — see mha_attention.)"""
    from streamvln_tpu.ops.attention import mha_attention
    rng = np.random.RandomState(2)
    B, S, H, D = 1, 384, 2, 64
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    ref = dense_attention(q, k, v)
    out = mha_attention(q, k, v, impl="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
