"""Whole-sequence VMEM encoder-attention kernel (ops/vit_attention.py).

Forward parity vs dense XLA in interpret mode, and the autodiff
regression: the kernel must be differentiable (custom VJP through the
dense recompute) — training with an unfrozen vision tower reverse-modes
through mha_attention's encoder dispatch (siglip.py:133)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.ops.attention import dense_attention, mha_attention
from streamvln_tpu.ops.vit_attention import vit_attention


@pytest.mark.parametrize("S,D", [(96, 64), (129, 72)])
def test_vit_attention_matches_dense(S, D):
    rng = np.random.RandomState(0)
    B, H = 2, 3
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
               for _ in range(3))
    out = vit_attention(q, k, v, interpret=True)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vit_attention_bf16_lowp_path():
    """bf16 inputs take the native-MXU path (bf16 multiplies, f32
    accumulate, deferred normalization, bf16 PV) — flash-attn
    semantics; error vs the f32 dense reference is bf16 rounding."""
    rng = np.random.RandomState(3)
    B, S, H, D = 2, 129, 3, 72
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D).astype(np.float32),
                           jnp.bfloat16) for _ in range(3))
    out = vit_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = dense_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert err / np.abs(np.asarray(ref)).max() < 2e-2


def test_vit_attention_grad_matches_dense():
    """Regression: the VMEM kernel had no VJP — jax.grad through the
    encoder dispatch raised 'Linearization failed' and broke TPU
    training with an unfrozen vision tower."""
    rng = np.random.RandomState(1)
    B, S, H, D = 1, 40, 2, 64
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
               for _ in range(3))

    def loss_kernel(q, k, v):
        return jnp.sum(vit_attention(q, k, v, interpret=True) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_mha_auto_vit_dispatch_grad():
    """The 'vit' dispatch point itself must be differentiable."""
    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(1, 32, 2, 64).astype(np.float32))
               for _ in range(3))
    g = jax.grad(lambda q: jnp.sum(
        mha_attention(q, k, v, impl="vit", interpret=True)))(q)
    assert np.isfinite(np.asarray(g)).all()
