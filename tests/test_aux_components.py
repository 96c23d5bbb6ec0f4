"""Aux capability surface: resamplers, anyres tiling, conversation
templates, weight tools, length-grouped sampler, offline eval."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.data.collate import LengthGroupedBatchSampler
from streamvln_tpu.data.conversation import (
    SeparatorStyle, conv_templates)
from streamvln_tpu.models.resampler import build_resampler
from streamvln_tpu.utils.mm_utils import (
    get_anyres_image_grid_shape, process_anyres_image,
    select_best_resolution)
from streamvln_tpu.utils.weight_tools import (
    apply_delta, consolidate, make_delta)


# -- resamplers ----------------------------------------------------------

def test_identity_resampler():
    init, apply = build_resampler(None)
    x = jnp.ones((2, 16, 8))
    assert apply(init(None, 8), x).shape == (2, 16, 8)


def test_masked_drop_resampler():
    init, apply = build_resampler("masked_drop", ratio=0.5)
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    out = apply({}, x, rng=jax.random.PRNGKey(0), train=True)
    assert out.shape == (2, 8, 4)
    # kept tokens are original rows in original order
    for b in range(2):
        rows = {tuple(r) for r in np.asarray(x[b])}
        assert all(tuple(r) in rows for r in np.asarray(out[b]))
    # eval mode keeps everything
    assert apply({}, x, train=False).shape == (2, 16, 4)


def test_spatial_pool_resampler():
    init, apply = build_resampler("spatial_pool", stride=2)
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
    out = apply({}, x)
    np.testing.assert_allclose(np.asarray(out).squeeze(),
                               [2.5, 4.5, 10.5, 12.5])


def test_perceiver_resampler():
    init, apply = build_resampler("perceiver", num_latents=8,
                                  num_layers=1, num_heads=2)
    params = init(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16))
    out = apply(params, x)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_qformer_resampler():
    # tiny config: 4 layers, cross-attention every 2nd, 8 latents,
    # hidden 32 independent of the 16-dim input features
    init, apply = build_resampler("qformer", num_latents=8,
                                  hidden_size=32, num_layers=4,
                                  num_heads=4, cross_attention_freq=2,
                                  intermediate_size=64)
    params = init(jax.random.PRNGKey(0), 16)
    # layers 0 and 2 carry cross-attention; 1 and 3 do not
    assert "cross" in params["layers"][0]
    assert "cross" not in params["layers"][1]
    assert "cross" in params["layers"][2]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16))
    out = apply(params, x)
    assert out.shape == (2, 8, 32)
    assert np.isfinite(np.asarray(out)).all()
    # output depends on the image features through cross-attention
    out2 = apply(params, x + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


# -- anyres --------------------------------------------------------------

def test_select_best_resolution():
    grids = [(336, 672), (672, 336), (672, 672), (1008, 336),
             (336, 1008)]
    assert select_best_resolution((600, 300), grids) == (672, 336)
    assert select_best_resolution((300, 600), grids) == (336, 672)


def test_anyres_tiling():
    img = np.random.RandomState(0).randint(0, 255, (300, 600, 3),
                                           np.uint8)
    grids = [(672, 336), (336, 672)]
    tiles = process_anyres_image(img, grids, tile_size=336)
    # thumbnail + 2x1 grid of tiles
    assert tiles.shape == (3, 336, 336, 3)
    assert get_anyres_image_grid_shape((600, 300), grids, 336) == (2, 1)


# -- conversation templates ----------------------------------------------

def test_chatml_template_matches_chatml_module():
    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message("user", "hello")
    conv.append_message("assistant", "hi")
    expect = ("<|im_start|>system\nYou are a helpful assistant."
              "<|im_end|>\n<|im_start|>user\nhello<|im_end|>\n"
              "<|im_start|>assistant\nhi<|im_end|>\n")
    assert conv.get_prompt() == expect


def test_generation_prompt_open_turn():
    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message("user", "go")
    conv.append_message("assistant", None)
    assert conv.get_prompt().endswith("<|im_start|>assistant\n")


def test_vicuna_and_llama_templates_render():
    v = conv_templates["vicuna_v1"].copy()
    v.append_message("USER", "hi")
    v.append_message("ASSISTANT", "hello")
    s = v.get_prompt()
    assert "USER: hi" in s and s.endswith("</s>")
    l2 = conv_templates["llava_llama_2"].copy()
    l2.append_message("USER", "hi")
    l2.append_message("ASSISTANT", "hello")
    s = l2.get_prompt()
    assert s.startswith("<s>[INST]") and "[/INST] hello </s>" in s


def test_registry_breadth_and_new_styles():
    # all 26 reference names resolve (llava/conversation.py:566-593)
    for name in ["default", "v0", "v1", "vicuna_v1", "llama_2",
                 "mistral_instruct", "mistral_orca", "mistral_zephyr",
                 "mistral_direct", "plain", "v0_plain",
                 "chatml_direct", "llava_v0", "llava_v0_mmtag",
                 "llava_v1", "llava_v1_mmtag", "llava_llama_2",
                 "llava_llama_3", "llava_llama_2_simple",
                 "llava_llama_2_mmtag", "llava_mistral_instruct",
                 "mpt", "qwen_1_5", "qwen_2", "qwen_2_5",
                 "gemma_instruct"]:
        assert name in conv_templates, name

    v0 = conv_templates["llava_v0"].copy()
    v0.append_message("Human", "hi")
    v0.append_message("Assistant", None)
    s = v0.get_prompt()
    assert "###Human: hi###Assistant:" in s

    mpt = conv_templates["mpt"].copy()
    mpt.append_message(mpt.roles[0], "hi")
    mpt.append_message(mpt.roles[1], None)
    s = mpt.get_prompt()
    assert s.endswith("<|im_start|>user\nhi<|im_end|>"
                      "<|im_start|>assistant\n")

    z = conv_templates["mistral_zephyr"].copy()
    z.append_message(z.roles[0], "hi")
    z.append_message(z.roles[1], "yo")
    assert "<|user|>\nhi</s><|assistant|>\nyo</s>" in z.get_prompt()

    l3 = conv_templates["llava_llama_3"].copy()
    l3.append_message("user", "hi")
    l3.append_message("assistant", None)
    s = l3.get_prompt()
    assert s.startswith("<|begin_of_text|>"
                        "<|start_header_id|>system<|end_header_id|>")
    assert s.endswith(
        "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n")

    g = conv_templates["gemma_instruct"].copy()
    g.append_message("user", "hi")
    g.append_message("model", "yo")
    assert g.get_prompt() == ("<start_of_turn>user\nhi<end_of_turn>\n"
                              "<start_of_turn>model\nyo<end_of_turn>\n")

    mi = conv_templates["mistral_instruct"].copy()
    mi.append_message("USER", "hi")
    mi.append_message("ASSISTANT", "yo")
    assert mi.get_prompt() == "[INST] hi [/INST] yo </s>"


# -- weight tools ----------------------------------------------------------

def test_delta_roundtrip():
    base = {"a": np.ones((2, 2), np.float32),
            "b": {"c": np.zeros(3, np.float32)}}
    target = {"a": np.full((2, 2), 3.0, np.float32),
              "b": {"c": np.arange(3, dtype=np.float32)}}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for x, y in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(target)):
        np.testing.assert_allclose(x, y)


def test_consolidate():
    tree = {"x": jnp.ones((4,))}
    out = consolidate(tree)
    assert isinstance(out["x"], np.ndarray)


# -- length-grouped sampler -------------------------------------------------

def test_length_grouped_sampler_reduces_spread():
    rng = np.random.RandomState(0)
    lengths = rng.randint(10, 1000, 256)
    sampler = LengthGroupedBatchSampler(lengths, batch_size=8, seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler)
    seen = [i for b in batches for i in b]
    assert len(set(seen)) == len(seen)
    spreads = [np.ptp(lengths[b]) for b in batches]
    rand_spreads = [np.ptp(lengths[rng.choice(256, 8, replace=False)])
                    for _ in range(len(batches))]
    assert np.mean(spreads) < np.mean(rand_spreads) * 0.6


# -- offline eval ------------------------------------------------------------

@pytest.mark.slow
def test_offline_eval(tmp_path):
    from PIL import Image
    from streamvln_tpu.agent import VLNAgent
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    from streamvln_tpu.eval.offline import run_offline_eval
    from streamvln_tpu.models import streamvln
    from streamvln_tpu.streaming.engine import StreamingEngine

    media = tmp_path / "media"
    media.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
        str(media / "img.jpg"))
    entries = [{"id": 7, "image": "img.jpg", "conversations": [
        {"from": "human", "value": "<image>\nWhat is shown?"},
        {"from": "gpt", "value": "noise"}]}]

    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=1024, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)
    out_file = str(tmp_path / "answers.jsonl")
    answers = run_offline_eval(agent, entries, str(media), out_file)
    assert len(answers) == 1
    assert answers[0]["question_id"] == 7
    rec = json.loads(open(out_file).read().splitlines()[0])
    assert isinstance(rec["text"], str)
