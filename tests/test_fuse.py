"""Projection fusion (models/fuse.py): fused qkv / gate-up matmuls must
match the unfused forward bit-for-bit (output columns are independent
reductions), across float / int8 / packed-int4 weights, and through the
StreamingEngine (fuse_proj defaults on)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_llm
from streamvln_tpu.models import quant, qwen2
from streamvln_tpu.models.fuse import fuse_projections


def _fwd(params, cfg, seed=1, S=8):
    x = jax.random.normal(jax.random.PRNGKey(seed),
                          (2, S, cfg.hidden_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (2, S))
    out, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    return np.asarray(out)


@pytest.mark.parametrize("bits", [16, 8, 4])
def test_fused_forward_matches_unfused(bits):
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    if bits in (4, 8):
        params = quant.quantize_llm({"llm": params}, bits=bits)["llm"]
    fused = fuse_projections(params)
    layers = fused["layers"]
    assert "qkv_w" in layers and "q_w" not in layers
    assert "gu_w" in layers and "gate_w" not in layers
    ref = _fwd(params, cfg)
    out = _fwd(fused, cfg)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_fusion_skips_lora_layers():
    cfg = tiny_llm()
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    layers = dict(params["layers"])
    layers["q_w_lora_a"] = jnp.zeros((cfg.num_layers,
                                      cfg.hidden_size, 4))
    params = dict(params, layers=layers)
    fused = fuse_projections(params)
    assert "qkv_w" not in fused["layers"]       # attention untouched
    assert "gu_w" in fused["layers"]            # mlp still fuses


def test_engine_fused_tokens_match_unfused():
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data import chatml
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()

    def run(fuse):
        eng = StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,),
                              compute_dtype=jnp.float32,
                              max_new_tokens=6, cache_capacity=1024,
                              buckets=(768,), fuse_proj=fuse)
        ids, _ = chatml.tokenize_dialogue(
            tok, [("user", chatml.observation_prompt(None, "go"))],
            add_system=True, with_labels=False)
        ids = np.concatenate([ids, np.asarray(
            chatml.generation_prompt(tok), np.int32)])
        frame = np.random.RandomState(0).randint(
            0, 255, (48, 64, 3)).astype(np.uint8)
        return eng.generate(0, frame, ids, step_id=0)

    assert list(run(True)) == list(run(False))


def test_fused_act_int8_matches_unfused():
    """act_int8 (int8 x int8 MXU) composes with fused projections:
    per-token activation quant is independent of output columns."""
    import dataclasses
    cfg = dataclasses.replace(tiny_llm(), act_int8=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = quant.quantize_llm({"llm": params}, bits=8)["llm"]
    fused = fuse_projections(params)
    ref = _fwd(params, cfg)
    out = _fwd(fused, cfg)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

