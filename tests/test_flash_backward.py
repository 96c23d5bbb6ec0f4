"""Flash attention backward (custom VJP) vs dense autodiff grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.ops.attention import dense_attention
from streamvln_tpu.ops.flash_attention import (
    INVALID_POS, flash_attention)


@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (4, 2)])
def test_flash_grads_match_dense(Hq, Hkv):
    rng = np.random.RandomState(0)
    B, S, D = 2, 100, 128
    q = rng.randn(B, S, Hq, D).astype(np.float32) * 0.3
    k = rng.randn(B, S, Hkv, D).astype(np.float32) * 0.3
    v = rng.randn(B, S, Hkv, D).astype(np.float32) * 0.3
    q_pos = np.arange(S)[None].repeat(B, 0).astype(np.int32)
    k_pos = q_pos.copy()
    k_pos[:, 90:] = INVALID_POS
    g = rng.randn(B, S, Hq, D).astype(np.float32)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(
            q, k, v, jnp.asarray(q_pos), jnp.asarray(k_pos),
            block_q=128, block_k=128, interpret=True), jnp.asarray(g))

    def f_dense(q, k, v):
        mask = jnp.asarray(k_pos[:, None, :] <= q_pos[:, :, None])
        return jnp.vdot(dense_attention(q, k, v, mask), jnp.asarray(g))

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for name, a, b in zip("qkv", gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"d{name}")


def test_flash_grad_under_remat():
    """jax.checkpoint over the custom-VJP kernel (the training config)."""
    rng = np.random.RandomState(1)
    B, S, H, D = 1, 128, 2, 128
    q = rng.randn(B, S, H, D).astype(np.float32) * 0.3
    k = rng.randn(B, S, H, D).astype(np.float32) * 0.3
    v = rng.randn(B, S, H, D).astype(np.float32) * 0.3

    @jax.checkpoint
    def inner(q, k, v):
        return flash_attention(q, k, v, block_q=128, block_k=128,
                               interpret=True)

    def loss(q, k, v):
        return jnp.mean(inner(q, k, v) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a in grads:
        assert np.isfinite(np.asarray(a)).all()
        assert np.abs(np.asarray(a)).max() > 0
