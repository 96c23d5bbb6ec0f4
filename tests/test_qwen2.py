"""Qwen2 decoder unit tests: primitives vs torch oracle, GQA attention,
KV-cache/full-forward parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_llm
from streamvln_tpu.models import qwen2
from streamvln_tpu.ops.attention import dense_attention, make_causal_mask


def test_rms_norm_matches_torch():
    import torch
    x = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    scale = np.random.RandomState(1).rand(32).astype(np.float32)
    ours = qwen2.rms_norm(jnp.asarray(x), jnp.asarray(scale), 1e-6)
    xt = torch.tensor(x)
    ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) \
        * torch.tensor(scale)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_rope_matches_hf_rotate_half():
    import torch
    B, S, H, D = 2, 6, 3, 8
    x = np.random.RandomState(0).randn(B, S, H, D).astype(np.float32)
    pos = np.arange(S)[None].repeat(B, 0)
    theta = 10000.0
    ours = qwen2.apply_rope(jnp.asarray(x), jnp.asarray(pos), theta)

    # HF-style reference
    inv_freq = 1.0 / (theta ** (np.arange(0, D, 2) / D))
    freqs = np.einsum("s,d->sd", np.arange(S, dtype=np.float64), inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = np.cos(emb), np.sin(emb)   # [S, D]
    xt = torch.tensor(x)
    x1, x2 = xt[..., : D // 2], xt[..., D // 2:]
    rotated = torch.cat([-x2, x1], dim=-1)
    ref = xt * torch.tensor(cos, dtype=torch.float32)[None, :, None, :] \
        + rotated * torch.tensor(sin, dtype=torch.float32)[None, :, None, :]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_gqa_dense_attention_vs_repeated_mha():
    rng = np.random.RandomState(0)
    B, Sq, Sk, Hq, Hkv, D = 2, 5, 7, 4, 2, 8
    q = rng.randn(B, Sq, Hq, D).astype(np.float32)
    k = rng.randn(B, Sk, Hkv, D).astype(np.float32)
    v = rng.randn(B, Sk, Hkv, D).astype(np.float32)
    mask = rng.rand(B, Sq, Sk) > 0.3
    mask[:, :, 0] = True  # each query attends to something
    out = dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(mask))

    # naive reference with explicit kv repetition
    G = Hq // Hkv
    k_rep = np.repeat(k, G, axis=2)
    v_rep = np.repeat(v, G, axis=2)
    scale = D ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k_rep) * scale
    logits = np.where(mask[:, None], logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", probs, v_rep)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_kv_cache_parity_with_full_forward():
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    B, S = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    full_logits, _ = qwen2.forward(params, cfg, x, pos)

    cache = qwen2.KVCache.create(cfg, B, 32, dtype=jnp.float32)
    l1, cache = qwen2.forward(params, cfg, x[:, :10], pos[:, :10],
                              cache=cache)
    outs = [l1]
    for t in range(10, S):
        lt, cache = qwen2.forward(params, cfg, x[:, t:t + 1],
                                  pos[:, t:t + 1], cache=cache)
        outs.append(lt)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full_logits),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.length[0]) == S


@pytest.mark.slow
def test_kv_cache_padded_prefill_parity():
    """Right-padded prefill chunks must not corrupt later attention."""
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    B, S = 1, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    full_logits, _ = qwen2.forward(params, cfg, x, pos)

    cache = qwen2.KVCache.create(cfg, B, 32, dtype=jnp.float32)
    # prefill 8 real tokens padded to 10 (pad embeds are garbage)
    pad = jnp.ones((B, 2, cfg.hidden_size), x.dtype) * 7.0
    x1 = jnp.concatenate([x[:, :8], pad], axis=1)
    pos1 = jnp.concatenate([pos[:, :8], pos[:, 7:9]], axis=1)
    _, cache = qwen2.forward(params, cfg, x1, pos1, cache=cache,
                             new_lengths=jnp.array([8]))
    # second chunk: remaining 4 real tokens
    l2, cache = qwen2.forward(params, cfg, x[:, 8:], pos[:, 8:],
                              cache=cache)
    np.testing.assert_allclose(np.asarray(l2),
                               np.asarray(full_logits[:, 8:]),
                               rtol=2e-4, atol=2e-4)


def test_reset_rows_reuses_buffer():
    cfg = tiny_llm()
    cache = qwen2.KVCache.create(cfg, 4, 16, dtype=jnp.float32)
    cache = qwen2.KVCache(cache.k, cache.v,
                          jnp.array([3, 5, 7, 9], jnp.int32))
    cache = cache.reset_rows(jnp.array([False, True, False, True]))
    np.testing.assert_array_equal(np.asarray(cache.length), [3, 0, 7, 0])


@pytest.mark.slow
def test_remat_chunk_and_mlp_chunk_exactness():
    """Nested (unrolled) layer-chunk remat and the token-chunked MLP are
    pure memory transforms: loss is bit-exact and grads match to fp
    accumulation noise vs the plain rematted scan."""
    cfg = tiny_llm()
    # need num_layers divisible by the chunk; tiny_llm has 2 layers
    assert cfg.num_layers % 2 == 0
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, S = 2, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))

    def loss(p, rc, mc):
        lg, _ = qwen2.forward(p, cfg, x, pos, remat=True,
                              remat_chunk=rc, mlp_chunk=mc)
        return jnp.sum(lg.astype(jnp.float32) ** 2) / (B * S)

    l0, g0 = jax.value_and_grad(loss)(params, None, None)
    l1, g1 = jax.value_and_grad(loss)(params, 2, 8)
    # same math per token; XLA may fuse/reassociate dots differently
    # between the two loop structures, so "exact" = fp accumulation noise
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-6)), g0, g1)
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs
