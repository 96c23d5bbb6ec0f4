"""LLM family breadth: Llama/Mistral/Gemma logits parity vs
transformers (reference wrapper surface:
llava/model/language_model/llava_{llama,mistral,gemma}.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from streamvln_tpu.configs import Qwen2Config, llm_config
from streamvln_tpu.models import convert_hf, qwen2


def _parity(hf_model, cfg, ids):
    torch = pytest.importorskip("torch")
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_hf.convert_llm(state, cfg, dtype=jnp.float32)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(ids)).logits.numpy()
    x = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    got, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                               rtol=2e-3)


def test_llama_parity():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_bias=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, qkv_bias=False)
    ids = np.random.RandomState(0).randint(0, 128, (2, 9))
    _parity(hf, cfg, ids)


def test_mistral_parity():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM
    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, sliding_window=None)
    torch.manual_seed(1)
    hf = MistralForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, qkv_bias=False)
    ids = np.random.RandomState(1).randint(0, 128, (2, 7))
    _parity(hf, cfg, ids)


def test_gemma_parity():
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM
    hf_cfg = GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
        rms_norm_eps=1e-6, max_position_embeddings=128,
        hidden_act="gelu_pytorch_tanh", hidden_activation=
        "gelu_pytorch_tanh")
    torch.manual_seed(2)
    hf = GemmaForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, rms_norm_eps=1e-6, qkv_bias=False,
        tie_word_embeddings=True, mlp_act="gelu_tanh",
        norm_offset=True, scale_embeddings=True)
    ids = np.random.RandomState(2).randint(0, 128, (2, 8))
    _parity(hf, cfg, ids)


def test_family_registry():
    for name in ("qwen2-7b", "llama2-7b", "llama3-8b", "mistral-7b",
                 "gemma-2b"):
        cfg = llm_config(name)
        assert isinstance(cfg, Qwen2Config)
    assert llm_config("llama2-7b").qkv_bias is False
    assert llm_config("gemma-2b").norm_offset is True
    with pytest.raises(ValueError):
        llm_config("gpt-j")


def test_family_decode_with_cache():
    # the streaming cache path works for a bias-free llama-style config
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, qkv_bias=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[3, 5, 7, 11]])
    x = qwen2.embed_tokens(params, ids, cfg)
    pos = jnp.arange(4)[None]
    full, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")

    cache = qwen2.KVCache.create(cfg, 1, 64, jnp.float32)
    inc = []
    for i in range(4):
        xi = qwen2.embed_tokens(params, ids[:, i:i + 1], cfg)
        logits, cache = qwen2.forward(params, cfg, xi,
                                      jnp.asarray([[i]]), cache=cache,
                                      attn_impl="dense")
        inc.append(np.asarray(logits[0, 0]))
    np.testing.assert_allclose(np.stack(inc), np.asarray(full[0]),
                               atol=1e-4, rtol=1e-4)


def test_mixtral_parity():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM
    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=128, num_local_experts=4,
        num_experts_per_tok=2, sliding_window=None)
    torch.manual_seed(3)
    hf = MixtralForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, qkv_bias=False,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True)
    ids = np.random.RandomState(3).randint(0, 128, (2, 6))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf.convert_moe_llm(state, cfg, dtype=jnp.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    x = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    got, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                               rtol=2e-3)


def test_qwen2_moe_parity():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    hf_cfg = Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=128, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_intermediate_size=64, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        sliding_window=None, use_sliding_window=False)
    torch.manual_seed(4)
    hf = Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, rms_norm_eps=1e-6, qkv_bias=True,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=64)
    ids = np.random.RandomState(4).randint(0, 128, (2, 6))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf.convert_moe_llm(state, cfg, dtype=jnp.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    x = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    got, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                               rtol=2e-3)


def test_moe_decode_with_cache():
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, qkv_bias=False, num_experts=4,
        num_experts_per_tok=2)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    assert "e_gate" in params["layers"]
    assert "gate_w" not in params["layers"]
    ids = jnp.asarray([[3, 5, 7, 11]])
    x = qwen2.embed_tokens(params, ids, cfg)
    pos = jnp.arange(4)[None]
    full, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    cache = qwen2.KVCache.create(cfg, 1, 64, jnp.float32)
    inc = []
    for i in range(4):
        xi = qwen2.embed_tokens(params, ids[:, i:i + 1], cfg)
        logits, cache = qwen2.forward(params, cfg, xi,
                                      jnp.asarray([[i]]), cache=cache,
                                      attn_impl="dense")
        inc.append(np.asarray(logits[0, 0]))
    np.testing.assert_allclose(np.stack(inc), np.asarray(full[0]),
                               atol=1e-4, rtol=1e-4)


def test_mpt_parity():
    torch = pytest.importorskip("torch")
    from transformers import MptConfig, MptForCausalLM
    hf_cfg = MptConfig(
        d_model=32, n_heads=4, n_layers=2, vocab_size=128,
        max_seq_len=128, layer_norm_epsilon=1e-5)
    torch.manual_seed(5)
    hf = MptForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
        rms_norm_eps=1e-5, qkv_bias=False, tie_word_embeddings=True,
        mlp_act="gelu", positional="alibi", norm_type="layernorm",
        mlp_gated=False)
    ids = np.random.RandomState(5).randint(0, 128, (2, 10))
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf.convert_mpt(state, cfg, dtype=jnp.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    x = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    got, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                               rtol=2e-3)


def test_mpt_decode_with_cache():
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
        qkv_bias=False, tie_word_embeddings=True, mlp_act="gelu",
        positional="alibi", norm_type="layernorm", mlp_gated=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    assert "gate_w" not in params["layers"]
    ids = jnp.asarray([[3, 5, 7, 11]])
    x = qwen2.embed_tokens(params, ids, cfg)
    pos = jnp.arange(4)[None]
    full, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    cache = qwen2.KVCache.create(cfg, 1, 64, jnp.float32)
    inc = []
    for i in range(4):
        xi = qwen2.embed_tokens(params, ids[:, i:i + 1], cfg)
        logits, cache = qwen2.forward(params, cfg, xi,
                                      jnp.asarray([[i]]), cache=cache,
                                      attn_impl="dense")
        inc.append(np.asarray(logits[0, 0]))
    np.testing.assert_allclose(np.stack(inc), np.asarray(full[0]),
                               atol=1e-4, rtol=1e-4)


def test_moe_capacity_dispatch_matches_dense():
    import dataclasses
    base = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        rope_theta=10000.0, qkv_bias=False, num_experts=4,
        num_experts_per_tok=2,
        shared_expert_intermediate_size=48)
    params = qwen2.init(jax.random.PRNGKey(0), base)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 64)
    x = qwen2.embed_tokens(params, ids, base)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    ref, _ = qwen2.forward(params, base, x, pos, attn_impl="dense")

    # ample capacity: no drops -> identical outputs
    cap = dataclasses.replace(base, moe_dispatch="capacity",
                              moe_capacity_factor=8.0)
    got, _ = qwen2.forward(params, cap, x, pos, attn_impl="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # tight capacity: still finite, close in distribution
    tight = dataclasses.replace(base, moe_dispatch="capacity",
                                moe_capacity_factor=1.0)
    got_t, _ = qwen2.forward(params, tight, x, pos, attn_impl="dense")
    assert np.isfinite(np.asarray(got_t)).all()
