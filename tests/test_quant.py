"""Int8 weight-only quantization: error bounds + forward fidelity."""
import pytest
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


@pytest.mark.slow
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


def test_tied_int8_embed_logits_scaled():
    """quantize_embed on a tied-embedding config must apply embed_scale
    in lm_head_logits; raw-int8 logits silently change the argmax."""
    import dataclasses
    cfg = dataclasses.replace(tiny_llm(), tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    assert "lm_head" not in params
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    ref, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")

    qparams = quant.quantize_llm({"llm": params},
                                 quantize_embed=True)["llm"]
    assert qparams["embed"].dtype == jnp.int8
    xq = qwen2.embed_tokens(qparams, ids)
    out, _ = qwen2.forward(qparams, cfg, xq, pos, attn_impl="dense")

    ref_n = np.asarray(jax.nn.softmax(ref, -1))
    out_n = np.asarray(jax.nn.softmax(out, -1))
    assert np.abs(ref_n - out_n).max() < 0.05
    agree = (np.argmax(np.asarray(ref), -1)
             == np.argmax(np.asarray(out), -1)).mean()
    assert agree >= 0.9


def test_dequantize_llm_roundtrip():
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm({"llm": params}, quantize_embed=True)
    deq = quant.dequantize_llm(qparams)["llm"]
    assert deq["embed"].dtype == jnp.float32
    assert "embed_scale" not in deq
    assert "q_w_scale" not in deq["layers"]
    for name in ("embed",):
        a = np.asarray(params[name], np.float32)
        b = np.asarray(deq[name])
        amax = np.abs(a).max(axis=-1, keepdims=True)
        assert (np.abs(a - b) <= amax / 127 / 2 + 1e-8).all()
    w = np.asarray(params["layers"]["q_w"], np.float32)
    wd = np.asarray(deq["layers"]["q_w"])
    smax = np.abs(w).max(axis=-2, keepdims=True)
    assert (np.abs(w - wd) <= smax / 127 / 2 + 1e-8).all()


def test_export_hf_dequantizes_int8():
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.utils.checkpoint import export_hf
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_llm(params, quantize_embed=True)
    sd_fp = export_hf(params, cfg)
    sd_q = export_hf(qparams, cfg)
    assert set(sd_fp) == set(sd_q)
    for k in sd_q:
        assert sd_q[k].dtype == np.float32, k
    emb = sd_fp["model.embed_tokens.weight"]
    emb_q = sd_q["model.embed_tokens.weight"]
    amax = np.abs(emb).max(axis=-1, keepdims=True)
    assert (np.abs(emb - emb_q) <= amax / 127 / 2 + 1e-8).all()
    w = sd_fp["model.layers.0.mlp.gate_proj.weight"]
    wq = sd_q["model.layers.0.mlp.gate_proj.weight"]
    assert np.abs(w - wq).max() < np.abs(w).max() / 64


def test_int8_dynamic_matmul_close_to_fp():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 64).astype(np.float32)
    w = (rng.randn(64, 32) * 0.05).astype(np.float32)
    q, scale = quant.quantize_weight(jnp.asarray(w))
    ref = x @ w
    out = np.asarray(quant.int8_dynamic_matmul(jnp.asarray(x), q,
                                               scale))
    assert out.shape == (4, 32)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.02


def test_act_int8_forward_close():
    import dataclasses
    cfg = tiny_llm()
    params = quant.quantize_llm(
        {"llm": qwen2.init(jax.random.PRNGKey(0), cfg)})["llm"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    ref, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    cfg8 = dataclasses.replace(cfg, act_int8=True)
    out, _ = qwen2.forward(params, cfg8, x, pos, attn_impl="dense")
    ref_n = np.asarray(jax.nn.softmax(ref, -1))
    out_n = np.asarray(jax.nn.softmax(out, -1))
    assert np.abs(ref_n - out_n).max() < 0.08
    agree = (np.argmax(np.asarray(ref), -1)
             == np.argmax(np.asarray(out), -1)).mean()
    assert agree >= 0.85


def test_quantized_moe_forward_close():
    import dataclasses
    cfg = dataclasses.replace(
        tiny_llm(), num_experts=4, num_experts_per_tok=2,
        shared_expert_intermediate_size=64, qkv_bias=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                             cfg.vocab_size)
    x = qwen2.embed_tokens(params, ids, cfg)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    ref, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")

    qparams = quant.quantize_llm({"llm": params})["llm"]
    assert qparams["layers"]["e_gate"].dtype == jnp.int8
    assert qparams["layers"]["s_gate_w"].dtype == jnp.int8
    assert qparams["layers"]["router_w"].dtype != jnp.int8
    out, _ = qwen2.forward(qparams, cfg, x, pos, attn_impl="dense")
    ref_n = np.asarray(jax.nn.softmax(ref, -1))
    out_n = np.asarray(jax.nn.softmax(out, -1))
    assert np.abs(ref_n - out_n).max() < 0.06


def test_int8_dynamic_matmul_gradient_flows():
    # jnp.round has zero gradient; the STE + custom_vjp must keep
    # training-time gradients alive and aligned with the f32 map
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, 32) * 0.05).astype(np.float32))
    q, scale = quant.quantize_weight(w)
    g = jax.grad(lambda x: quant.int8_dynamic_matmul(x, q,
                                                     scale).sum())(x)
    ref = jax.grad(lambda x: (x @ w).sum())(x)
    cos = float((g * ref).sum()
                / (jnp.linalg.norm(g) * jnp.linalg.norm(ref)))
    assert cos > 0.99


def test_int4_quantize_roundtrip_and_shapes():
    rng = np.random.RandomState(7)
    w = jnp.asarray((rng.randn(256, 96) * 0.04).astype(np.float32))
    q, scale = quant.quantize_weight_int4(w, group=128)
    # packed: two signed nibbles per byte along the contraction dim
    assert q.dtype == jnp.uint8 and q.shape == (128, 96)
    assert scale.shape == (2, 96)          # din/group groups
    deq = quant.dequant_int4(q, scale, jnp.float32)
    assert deq.shape == w.shape
    # symmetric 15-level grid: error bounded by half a quant step
    step = np.asarray(scale).repeat(128, axis=0)
    assert np.all(np.abs(np.asarray(deq) - np.asarray(w))
                  <= step / 2 + 1e-7)


@pytest.mark.slow
def test_int4_forward_close_to_fp():
    from streamvln_tpu.configs import tiny_llm
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 16, cfg.hidden_size), jnp.float32)
    pos = jnp.arange(16)[None]
    ref, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    q4 = quant.quantize_llm({"llm": params}, bits=4)["llm"]
    out, _ = qwen2.forward(q4, cfg, x, pos, attn_impl="dense")
    ref_n = np.asarray(jax.nn.softmax(ref, -1))
    out_n = np.asarray(jax.nn.softmax(out, -1))
    assert np.abs(ref_n - out_n).max() < 0.08
    # dequantize_llm inverts to the same forward exactly
    dq = quant.dequantize_llm({"llm": q4})["llm"]
    out_dq, _ = qwen2.forward(dq, cfg, x, pos, attn_impl="dense")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_dq))


def test_int4_engine_decode_runs():
    """StreamingEngine prefill+decode over an int4-quantized LLM."""
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data import chatml
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    params = quant.quantize_llm(params, bits=4)
    tok = ByteTokenizer()
    eng = StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,),
                          compute_dtype=jnp.float32, max_new_tokens=4,
                          cache_capacity=1024, buckets=(768,))
    ids, _ = chatml.tokenize_dialogue(
        tok, [("user", chatml.observation_prompt(None, "go"))],
        add_system=True, with_labels=False)
    ids = np.concatenate([ids, np.asarray(
        chatml.generation_prompt(tok), np.int32)])
    toks = eng.generate(0, np.zeros((48, 64, 3), np.uint8), ids,
                        step_id=0)
    assert 1 <= len(toks) <= 4


@pytest.mark.slow
def test_init_quantized_llm_matches_eager_reference():
    """The jitted (fused) embed/lm_head init must equal the eager math
    it replaced — the fusion exists purely to cap HBM transients (the
    eager [vocab, hidden] temporaries OOM'd the 14B-int4 build; the
    async failure surfaced as RESOURCE_EXHAUSTED on the engine's first
    call). Same keys, same ops, identical outputs."""
    cfg = tiny_llm()
    for bits in (8, 4):
        params = quant.init_quantized_llm(
            jax.random.PRNGKey(7), cfg, jnp.float32, bits=bits)

        keys = jax.random.split(jax.random.PRNGKey(7), 16)
        V, Dm = cfg.vocab_size, cfg.hidden_size
        emb = jax.random.normal(keys[8], (V, Dm), jnp.float32) \
            * (Dm ** -0.5)
        amax = jnp.max(jnp.abs(emb), axis=-1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        ref_emb = jnp.clip(jnp.round(emb / scale), -127,
                           127).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(params["embed"]),
                                      np.asarray(ref_emb))
        np.testing.assert_allclose(
            np.asarray(params["embed_scale"]),
            np.asarray(scale.astype(jnp.float32)), rtol=1e-6)

        if not cfg.tie_word_embeddings:
            head = (jax.random.normal(keys[9], (V, Dm), jnp.float32)
                    * (Dm ** -0.5)).T
            qfn = (quant.quantize_weight if bits == 8
                   else quant.quantize_weight_int4)
            ref_q, ref_s = qfn(head)
            np.testing.assert_array_equal(np.asarray(params["lm_head"]),
                                          np.asarray(ref_q))
            np.testing.assert_allclose(np.asarray(params["lm_head_scale"]),
                                       np.asarray(ref_s), rtol=1e-6)
