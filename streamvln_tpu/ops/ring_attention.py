"""Ring attention: sequence-parallel attention over a mesh axis.

TPU-native replacement for the reference's zigzag ring flash-attention
capability (reference: llava/model/language_model/modeling_llama.py:
385-563, 828-839 — present but dormant there; first-class here).

The sequence is sharded over a mesh axis. Each device holds local Q and
rotating K/V chunks; at every ring step it accumulates online-softmax
partial attention of its queries against the visiting K/V chunk, then
ppermutes K/V (+ key positions) to its ring neighbour. After
`axis_size` steps every query has seen every key exactly once. XLA
overlaps the ppermute with the block compute over ICI.

Causality/padding ride on the same position rule as the rest of the
framework: key j visible to query i iff k_pos[j] <= q_pos[i]; invalid
keys carry a huge sentinel. `make_ring_attention(..., zigzag=True)`
applies the zigzag chunk schedule (a pure position permutation here) so
causal work balances across the ring.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """One Q-shard x K-chunk block: returns (scores_max [B,H,G,Sq,1],
    exp-weighted value sum [B,Sq,H,G,D], exp sum [B,H,G,Sq,1])."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Sq, Hkv, G, D)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf,
                   k.astype(jnp.float32)) * scale
    mask = k_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)            # [B,Hkv,G,Sq,1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhgqk,bkhd->bhgqd", p, v.astype(jnp.float32))
    return m, pv, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_positions: jax.Array, k_positions: jax.Array,
                   axis_name: str,
                   scale: Optional[float] = None) -> jax.Array:
    """Call INSIDE shard_map with the seq dim sharded over `axis_name`.

    q: [B, Sq_local, Hq, D]; k/v: [B, Sk_local, Hkv, D];
    q_positions: [B, Sq_local]; k_positions: [B, Sk_local] (global ids).
    Returns [B, Sq_local, Hq, D].
    """
    n = jax.lax.psum(1, axis_name)
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    m0 = jnp.full((B, Hkv, G, Sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, Sq, 1), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, G, Sq, D), jnp.float32)

    def body(i, carry):
        k_cur, v_cur, kp_cur, m, l, acc = carry
        bm, pv, bl = _block_attend(q, k_cur, v_cur, q_positions, kp_cur,
                                   scale)
        m_new = jnp.maximum(m, bm)
        alpha_old = jnp.exp(m - m_new)
        alpha_blk = jnp.exp(bm - m_new)
        l = l * alpha_old + bl * alpha_blk
        acc = acc * alpha_old + pv * alpha_blk
        # rotate K/V to the next device (skipped after the last block)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        kp_nxt = jax.lax.ppermute(kp_cur, axis_name, perm)
        return (k_nxt, v_nxt, kp_nxt, m_new, l, acc)

    carry = (k, v, k_positions, m0, l0, acc0)
    carry = jax.lax.fori_loop(0, n, body, carry)
    _, _, _, m, l, acc = carry
    safe_l = jnp.where(l == 0.0, 1.0, l)
    out = (acc / safe_l)                                # [B,Hkv,G,Sq,D]
    out = jnp.einsum("bhgqd->bqhgd", out).reshape(B, Sq, Hq, D)
    return out.astype(q.dtype)


def zigzag_permutation(S: int, n: int):
    """Zigzag sequence order: device i holds chunks i and 2n-1-i, so
    causal-skip work balances across the ring (the reference's zigzag
    ring flash attention schedule; modeling_llama.py:385-563). Returns
    (perm, inv_perm) index arrays of length S."""
    assert S % (2 * n) == 0, (S, n)
    c = S // (2 * n)
    order = []
    for i in range(n):
        order.append(np.arange(i * c, (i + 1) * c))
        j = 2 * n - 1 - i
        order.append(np.arange(j * c, (j + 1) * c))
    perm = np.concatenate(order)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(S)
    return perm, inv


def make_ring_attention(mesh: Mesh, axis_name: str = "fsdp",
                        zigzag: bool = False):
    """shard_map wrapper: full arrays in, sequence sharded internally.

    q/k/v: [B, S, H, D] with S divisible by the axis size;
    positions: [B, S]. Use for long-context training where one device
    cannot hold the full S x S attention. zigzag=True re-orders the
    sequence so every device holds one early and one late chunk —
    since masking is position-based, this is a pure permutation with
    identical results and balanced causal work."""
    shard_map = jax.shard_map

    spec_qkv = P(None, axis_name, None, None)
    spec_pos = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_pos, spec_pos),
        out_specs=spec_qkv, check_vma=False)
    def fn(q, k, v, q_pos, k_pos):
        return ring_attention(q, k, v, q_pos, k_pos, axis_name)

    if not zigzag:
        return fn

    n = mesh.shape[axis_name]

    def zz(q, k, v, q_pos, k_pos):
        S = q.shape[1]
        perm, inv = zigzag_permutation(S, n)
        out = fn(q[:, perm], k[:, perm], v[:, perm],
                 q_pos[:, perm], k_pos[:, perm])
        return out[:, inv]

    return zz


def ring_attention_dryrun(mesh: Mesh) -> bool:
    """One zigzag ring-attention step over the mesh's fsdp axis,
    checked against dense attention (used by
    __graft_entry__.dryrun_multichip to validate the sequence-parallel
    path on the driver's virtual mesh). Returns False when the mesh
    has no fsdp extent to shard over."""
    import numpy as np

    from streamvln_tpu.ops.attention import dense_attention

    n = mesh.shape.get("fsdp", 1)
    if n < 2:
        return False
    rng = np.random.RandomState(0)
    B, S, H, D = 1, 8 * n, 2, 8
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    out = make_ring_attention(mesh, "fsdp", zigzag=True)(q, k, v, pos,
                                                         pos)
    mask = pos[:, None, :] <= pos[:, :, None]
    ref = dense_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    return True
