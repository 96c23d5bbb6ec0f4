"""Int8 weight-only quantization: error bounds + forward fidelity."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import tiny_llm
from streamvln_tpu.models import quant, qwen2


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    w = rng.randn(2, 64, 32).astype(np.float32) * 0.05
    q, scale = quant.quantize_weight(jnp.asarray(w))
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    err = np.abs(deq - w)
    # per-channel symmetric int8: error bounded by scale/2 per element
    bound = np.broadcast_to(np.asarray(scale) / 2 + 1e-8, w.shape)
    assert (err <= bound).all()


def test_quantized_forward_close_to_fp():
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    ref, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")

    qparams = quant.quantize_llm({"llm": params})["llm"]
    assert qparams["layers"]["q_w"].dtype == jnp.int8
    out, _ = qwen2.forward(qparams, cfg, x, pos, attn_impl="dense")

    ref_n = np.asarray(jax.nn.softmax(ref, -1))
    out_n = np.asarray(jax.nn.softmax(out, -1))
    # output distributions stay close (weights-only int8)
    assert np.abs(ref_n - out_n).max() < 0.05
    # greedy decisions overwhelmingly agree
    agree = (np.argmax(np.asarray(ref), -1)
             == np.argmax(np.asarray(out), -1)).mean()
    assert agree >= 0.9


def test_quantized_cache_decode_runs():
    cfg = tiny_llm()
    params = quant.quantize_llm(
        {"llm": qwen2.init(jax.random.PRNGKey(0), cfg)},
        quantize_embed=True)["llm"]
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    assert x.dtype != jnp.int8
    cache = qwen2.KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = qwen2.forward(params, cfg, x.astype(jnp.float32),
                                  jnp.arange(6)[None], cache=cache)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(cache.length[0]) == 6
