"""Scratch-cache decode contract (qwen2.make_scratch / forward(scratch=)
/ merge_scratch): the decode-loop mode that keeps the big KV cache
loop-invariant must be logit-exact vs the append-in-place path and must
merge back to the identical cache state.

This is the mechanism that removed XLA's loop-carried cache relayout
copies (docs/decode_roofline.md, scratch-cache decode) and unlocked 14B
batched-8 on one chip; the engine parity suites cover it end-to-end,
these tests pin the low-level contract directly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_llm
from streamvln_tpu.models import qwen2


def _prefill(params, cfg, B, S_pre, capacity, quantized, seed=1):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (B, S_pre), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S_pre), (B, S_pre))
    cache = qwen2.KVCache.create(cfg, B, capacity, dtype=jnp.float32,
                                 quantized=quantized)
    logits, cache = qwen2.forward(params, cfg, x, pos, cache=cache)
    return logits, cache, ids


@pytest.mark.parametrize("quantized", [False, True])
def test_scratch_decode_matches_append_in_place(quantized):
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    B, S_pre, n_dec, scratch_cap = 2, 10, 5, 8
    _, cache_a, _ = _prefill(params, cfg, B, S_pre, 32, quantized)
    _, cache_b, _ = _prefill(params, cfg, B, S_pre, 32, quantized)

    tok = jax.random.randint(jax.random.PRNGKey(7), (B, n_dec), 0,
                             cfg.vocab_size)
    scratch = qwen2.make_scratch(cfg, B, scratch_cap, cache_b)
    assert scratch.quantized == quantized

    for t in range(n_dec):
        x = qwen2.embed_tokens(params, tok[:, t:t + 1])
        # append-in-place: slot index == global position
        pos_a = cache_a.length[:, None]
        la, cache_a = qwen2.forward(params, cfg, x, pos_a,
                                    cache=cache_a)
        # scratch mode: big cache read-only, appends go to scratch
        pos_b = (cache_b.length + scratch.length)[:, None]
        lb, scratch = qwen2.forward(params, cfg, x, pos_b,
                                    cache=cache_b, scratch=scratch)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-5)
        # the big cache must not have moved
        assert int(cache_b.length[0]) == S_pre

    merged = qwen2.merge_scratch(cache_b, scratch)
    np.testing.assert_array_equal(np.asarray(merged.length),
                                  np.asarray(cache_a.length))
    # live slots identical (padded scratch extent past length holds
    # garbage by contract — compare only the live prefix)
    live = S_pre + n_dec
    # tolerance: the two paths compute the S=1 projections through
    # differently fused graphs (~1e-6 reassociation noise)
    np.testing.assert_allclose(np.asarray(merged.k[:, :, :, :live]),
                               np.asarray(cache_a.k[:, :, :, :live]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.v[:, :, :, :live]),
                               np.asarray(cache_a.v[:, :, :, :live]),
                               rtol=1e-5, atol=1e-5)
    if quantized:
        np.testing.assert_allclose(
            np.asarray(merged.k_scale[:, :, :, :live]),
            np.asarray(cache_a.k_scale[:, :, :, :live]),
            rtol=1e-6, atol=1e-6)

    # post-merge continuation from the merged cache matches the
    # in-place lineage exactly
    x = qwen2.embed_tokens(params, tok[:, :1])
    la, _ = qwen2.forward(params, cfg, x, cache_a.length[:, None],
                          cache=cache_a)
    lm, _ = qwen2.forward(params, cfg, x, merged.length[:, None],
                          cache=merged)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lm),
                               rtol=2e-5, atol=2e-5)


def test_scratch_rollback_via_frozen_length():
    """Speculative rollback contract: NOT advancing scratch.length
    discards rejected slots — the next append overwrites them and
    attention never sees them."""
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    B, S_pre = 1, 6
    _, cache, _ = _prefill(params, cfg, B, S_pre, 32, False)
    scratch = qwen2.make_scratch(cfg, B, 8, cache)

    good = jax.random.randint(jax.random.PRNGKey(3), (B, 1), 0,
                              cfg.vocab_size)
    bad = jax.random.randint(jax.random.PRNGKey(4), (B, 1), 0,
                             cfg.vocab_size)

    # write a token we then "reject" by freezing the length
    x_bad = qwen2.embed_tokens(params, bad)
    pos = (cache.length + scratch.length)[:, None]
    _, scr_spec = qwen2.forward(params, cfg, x_bad, pos, cache=cache,
                                scratch=scratch)
    rolled = qwen2.KVCache(scr_spec.k, scr_spec.v, scratch.length,
                           scr_spec.k_scale, scr_spec.v_scale)

    # accepted token decoded after the rollback must equal decoding it
    # on a scratch that never saw the rejected token
    x_good = qwen2.embed_tokens(params, good)
    l_roll, _ = qwen2.forward(params, cfg, x_good, pos, cache=cache,
                              scratch=rolled)
    l_clean, _ = qwen2.forward(params, cfg, x_good, pos, cache=cache,
                               scratch=scratch)
    np.testing.assert_allclose(np.asarray(l_roll),
                               np.asarray(l_clean), rtol=1e-6,
                               atol=1e-6)


def test_merge_scratch_write_mask_idle_row_self_copy():
    """A force-masked idle row whose base offset sits at the cache end
    (where dynamic_update_slice would clamp over live slots) must come
    back bit-identical, and active rows must still merge."""
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    B, cap, scratch_cap = 2, 16, 8
    # row 0 active at fill 4; row 1 idle and nearly full (base 14:
    # 14 + 8 > 16 would clamp the DUS start back over live slots)
    _, cache, _ = _prefill(params, cfg, B, 14, cap, False)
    cache = qwen2.KVCache(cache.k, cache.v,
                          jnp.array([4, 14], jnp.int32))
    scratch = qwen2.make_scratch(cfg, B, scratch_cap, cache)

    tok = jax.random.randint(jax.random.PRNGKey(9), (B, 1), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, tok)
    pos = (cache.length + scratch.length)[:, None]
    _, scratch = qwen2.forward(params, cfg, x, pos, cache=cache,
                               scratch=scratch)
    # freeze the idle row's scratch length (the engine's done-mask
    # contract), then merge with the idle row write-masked off
    scratch = qwen2.KVCache(
        scratch.k, scratch.v,
        scratch.length * jnp.array([1, 0], jnp.int32),
        scratch.k_scale, scratch.v_scale)
    before_k = np.asarray(cache.k[:, 1])
    merged = qwen2.merge_scratch(
        cache, scratch, write_mask=jnp.array([True, False]))

    np.testing.assert_array_equal(np.asarray(merged.length), [5, 14])
    # idle row bit-identical everywhere
    np.testing.assert_array_equal(np.asarray(merged.k[:, 1]), before_k)
    # active row got its token at slot 4
    np.testing.assert_allclose(np.asarray(merged.k[:, 0, :, 4]),
                               np.asarray(scratch.k[:, 0, :, 0]),
                               rtol=0, atol=0)
