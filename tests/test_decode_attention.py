"""Pallas decode kernel vs dense kv-major reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.ops.attention import dense_attention_kvmajor
from streamvln_tpu.ops.decode_attention import decode_attention


@pytest.mark.parametrize("Hq,Hkv,lengths", [
    (28, 4, [700, 1]),       # 7B head config, ragged lengths
    (8, 8, [512, 1024]),     # MHA, block-aligned lengths
    (12, 2, [3, 1023]),      # tiny + nearly-full
])
def test_decode_kernel_matches_dense(Hq, Hkv, lengths):
    rng = np.random.RandomState(0)
    B, Smax, D = len(lengths), 1024, 128
    q = rng.randn(B, 1, Hq, D).astype(np.float32)
    k = rng.randn(B, Hkv, Smax, D).astype(np.float32)
    v = rng.randn(B, Hkv, Smax, D).astype(np.float32)
    lengths = np.asarray(lengths, np.int32)

    out = decode_attention(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(lengths),
                           block_k=512, interpret=True)
    kpos = np.arange(Smax)[None].repeat(B, 0)
    mask = kpos[:, None, :] < lengths[:, None, None]
    ref = dense_attention_kvmajor(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_zero_length_is_finite():
    rng = np.random.RandomState(1)
    B, Smax, Hq, Hkv, D = 1, 512, 4, 2, 128
    q = rng.randn(B, 1, Hq, D).astype(np.float32)
    k = rng.randn(B, Hkv, Smax, D).astype(np.float32)
    v = rng.randn(B, Hkv, Smax, D).astype(np.float32)
    out = decode_attention(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray([0]),
                           block_k=512, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
