"""int8 KV cache (KVCache quantized=True): storage dtype/scale layout,
forward closeness to the f32 cache, decode-across-calls behavior, and
the engine flag."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import tiny_llm
from streamvln_tpu.models import qwen2


def _cfg():
    return tiny_llm()


def test_quantized_cache_layout_and_bytes():
    cfg = _cfg()
    c = qwen2.KVCache.create(cfg, 2, 64, jnp.float32, quantized=True)
    assert c.k.dtype == jnp.int8 and c.v.dtype == jnp.int8
    assert c.quantized
    # scales are 4D [L, B, Hkv, Smax] — a trailing singleton would be
    # lane-padded 128x by the TPU tiler (measured 0.8 GB/buffer at 14B)
    assert c.k_scale.shape == c.k.shape[:-1]
    bf16 = qwen2.KVCache.create(cfg, 2, 64, jnp.bfloat16)
    assert not bf16.quantized
    q_bytes = c.k.nbytes + c.k_scale.nbytes
    assert q_bytes < bf16.k.nbytes * 0.7     # ~half + scale overhead
    # (tiny head_dim inflates the relative scale cost; 128-dim heads ~51.5%)


def test_forward_close_to_unquantized_cache():
    cfg = _cfg()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.hidden_size),
                          jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(12)[None], (2, 12))
    cq = qwen2.KVCache.create(cfg, 2, 32, jnp.float32, quantized=True)
    cf = qwen2.KVCache.create(cfg, 2, 32, jnp.float32)
    oq, cq = qwen2.forward(params, cfg, x, pos, cache=cq,
                           attn_impl="dense")
    of, cf = qwen2.forward(params, cfg, x, pos, cache=cf,
                           attn_impl="dense")
    pq = np.asarray(jax.nn.softmax(oq[:, -1], -1))
    pf = np.asarray(jax.nn.softmax(of[:, -1], -1))
    assert np.abs(pq - pf).max() < 0.05
    assert int(cq.length[0]) == 12 and cq.k.dtype == jnp.int8

    # decode continuation stays close across several steps
    for s in range(3):
        x1 = jax.random.normal(jax.random.PRNGKey(10 + s),
                               (2, 1, cfg.hidden_size), jnp.float32)
        p1 = jnp.full((2, 1), 12 + s)
        oq, cq = qwen2.forward(params, cfg, x1, p1, cache=cq,
                               attn_impl="dense")
        of, cf = qwen2.forward(params, cfg, x1, p1, cache=cf,
                               attn_impl="dense")
        pq = np.asarray(jax.nn.softmax(oq[:, -1], -1))
        pf = np.asarray(jax.nn.softmax(of[:, -1], -1))
        assert np.abs(pq - pf).max() < 0.05


def test_reset_rows_preserves_scales():
    cfg = _cfg()
    c = qwen2.KVCache.create(cfg, 2, 16, jnp.float32, quantized=True)
    c2 = c.reset_rows(jnp.array([True, False]))
    assert c2.k_scale is not None and c2.quantized


def test_engine_kv_int8_generates():
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data import chatml
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    eng = StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,),
                          compute_dtype=jnp.float32, max_new_tokens=4,
                          cache_capacity=1024, buckets=(768,),
                          kv_int8=True)
    assert eng.cache.quantized
    ids, _ = chatml.tokenize_dialogue(
        tok, [("user", chatml.observation_prompt(None, "go"))],
        add_system=True, with_labels=False)
    ids = np.concatenate([ids, np.asarray(
        chatml.generation_prompt(tok), np.int32)])
    frame = np.random.RandomState(0).randint(
        0, 255, (48, 64, 3)).astype(np.uint8)
    toks = eng.generate(0, frame, ids, step_id=0)
    assert 1 <= len(toks) <= 4
    eng.reset_for_env(0)
    toks2 = eng.generate(0, frame, ids, step_id=0)
    assert list(toks2) == list(toks)      # reset is clean


def test_kv_int8_chunked_decode_matches_single_call():
    """continue_decode() (token-streaming serving) with the int8 cache:
    chunked generation must reproduce a single-call budget exactly
    (the quantization is deterministic, so chunk boundaries change no
    math). Regression: _decode_continue once inferred compute_dtype
    from cache.k.dtype, casting hidden states to int8."""
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data import chatml
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()

    def mk(budget):
        return StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,),
                               compute_dtype=jnp.float32,
                               max_new_tokens=budget,
                               cache_capacity=2048, buckets=(768,),
                               kv_int8=True)

    ids, _ = chatml.tokenize_dialogue(
        tok, [("user", chatml.observation_prompt(None, "turn left"))],
        add_system=True, with_labels=False)
    ids = np.concatenate([ids, np.asarray(
        chatml.generation_prompt(tok), np.int32)])
    frame = np.random.RandomState(9).randint(
        0, 255, (48, 64, 3)).astype(np.uint8)
    want = mk(12).generate(0, frame, ids, step_id=0)
    eng = mk(4)
    got = eng.generate(0, frame, ids, step_id=0)
    while len(got) < 12 and got[-1] != tok.im_end_id:
        chunk = eng.continue_decode(0)
        if not chunk:
            break
        got.extend(chunk)
    assert got[:len(want)] == list(want), f"{got} != {want}"
