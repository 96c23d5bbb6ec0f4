"""Ring attention vs dense reference on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.ops.attention import dense_attention
from streamvln_tpu.ops.flash_attention import INVALID_POS
from streamvln_tpu.ops.ring_attention import make_ring_attention
from streamvln_tpu.parallel import mesh as mesh_lib


@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (8, 2)])
def test_ring_matches_dense(Hq, Hkv):
    mesh = mesh_lib.make_mesh(dp=1, fsdp=4, tp=1,
                              devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    B, S, D = 2, 64, 16
    q = rng.randn(B, S, Hq, D).astype(np.float32)
    k = rng.randn(B, S, Hkv, D).astype(np.float32)
    v = rng.randn(B, S, Hkv, D).astype(np.float32)
    pos = np.arange(S)[None].repeat(B, 0).astype(np.int32)

    fn = make_ring_attention(mesh, "fsdp")
    out = fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
             jnp.asarray(pos), jnp.asarray(pos))

    mask = pos[:, None, :] <= pos[:, :, None]
    ref = dense_attention(jnp.asarray(q), jnp.asarray(k),
                          jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_with_padding_sentinels():
    mesh = mesh_lib.make_mesh(dp=1, fsdp=4, tp=1,
                              devices=jax.devices()[:4])
    rng = np.random.RandomState(1)
    B, S, H, D = 1, 32, 2, 8
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    q_pos = np.arange(S)[None].astype(np.int32)
    k_pos = np.arange(S)[None].astype(np.int32)
    k_pos[:, 24:] = INVALID_POS   # last device's chunk partially invalid

    fn = make_ring_attention(mesh, "fsdp")
    out = fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
             jnp.asarray(q_pos), jnp.asarray(k_pos))
    mask = k_pos[:, None, :] <= q_pos[:, :, None]
    ref = dense_attention(jnp.asarray(q), jnp.asarray(k),
                          jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_zigzag_matches_plain():
    mesh = mesh_lib.make_mesh(dp=1, fsdp=4, tp=1,
                              devices=jax.devices()[:4])
    rng = np.random.RandomState(2)
    B, S, H, D = 1, 64, 2, 16
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    pos = np.arange(S)[None].astype(np.int32)
    plain = make_ring_attention(mesh, "fsdp")(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos), jnp.asarray(pos))
    zz = make_ring_attention(mesh, "fsdp", zigzag=True)(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(zz), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
