"""HF checkpoint -> streamvln_tpu param tree conversion.

Maps the reference stack's weights (StreamVLNForCausalLM = HF Qwen2 +
LLaVA multimodal head + SigLIP tower; reference:
streamvln/model/stream_video_vln.py:32-48, llava/model/llava_arch.py:34-46)
into our functional pytrees:

- torch Linear weights are [out, in] -> transposed to [in, out]
- per-layer weights are stacked onto a leading [L] axis (scan layout)
- SigLIP: only the first 26 encoder layers are used (the reference drops
  the checkpoint's last layer; siglip_encoder.py:570-571); patch conv
  [D, 3, P, P] flattens to [(C, ph, pw), D] matching models/siglip.patchify
- lm_head [V, D] -> [D, V]

Works from (a) a directory of *.safetensors / pytorch_model*.bin, or
(b) an in-memory {name: np.ndarray} dict (tests).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import Qwen2Config, SigLIPConfig, StreamVLNConfig

Array = np.ndarray


def _stack(state: Dict[str, Array], fmt: str, n: int,
           transpose: bool = False) -> Array:
    mats = []
    for i in range(n):
        w = state[fmt.format(i)]
        mats.append(w.T if transpose else w)
    return np.stack(mats)


def convert_qwen2(state: Dict[str, Array], cfg: Qwen2Config,
                  prefix: str = "model.", dtype=jnp.bfloat16,
                  include_mlp: bool = True) -> dict:
    L = cfg.num_layers
    p = prefix

    def t(name):  # transposed linear
        return state[name].T

    layers = {
        "ln1": _stack(state, p + "layers.{}.input_layernorm.weight", L),
        "q_w": _stack(state, p + "layers.{}.self_attn.q_proj.weight", L,
                      transpose=True),
        "k_w": _stack(state, p + "layers.{}.self_attn.k_proj.weight", L,
                      transpose=True),
        "v_w": _stack(state, p + "layers.{}.self_attn.v_proj.weight", L,
                      transpose=True),
        "o_w": _stack(state, p + "layers.{}.self_attn.o_proj.weight", L,
                      transpose=True),
        "ln2": _stack(state,
                      p + "layers.{}.post_attention_layernorm.weight", L),
    }
    if include_mlp:
        layers.update({
            "gate_w": _stack(state, p + "layers.{}.mlp.gate_proj.weight",
                             L, transpose=True),
            "up_w": _stack(state, p + "layers.{}.mlp.up_proj.weight", L,
                           transpose=True),
            "down_w": _stack(state,
                             p + "layers.{}.mlp.down_proj.weight", L,
                             transpose=True),
        })
    if cfg.qkv_bias:
        for n in ("q", "k", "v"):
            layers[f"{n}_b"] = _stack(
                state, p + "layers.{}.self_attn." + n + "_proj.bias",
                L)
    params = {
        "embed": state[p + "embed_tokens.weight"],
        "layers": layers,
        "final_norm": state[p + "norm.weight"],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight")
    return _to_device(params, dtype)


# Llama / Mistral / Gemma share the HF module naming with Qwen2 (the
# bias-free families just skip the qkv biases above); one converter
# serves the whole wrapper-family surface (reference:
# llava/model/language_model/llava_{llama,mistral,gemma}.py).
convert_llm = convert_qwen2


def convert_moe_llm(state: Dict[str, Array], cfg: Qwen2Config,
                    prefix: str = "model.",
                    dtype=jnp.bfloat16) -> dict:
    """Mixtral / Qwen2-MoE state dict -> stacked-expert params
    (reference wrappers: llava_mixtral.py, llava_qwen_moe.py).

    Mixtral names the block `block_sparse_moe` with experts w1/w3/w2;
    Qwen2-MoE names it `mlp` with gate_proj/up_proj/down_proj plus a
    shared expert — both are sniffed from the state dict."""
    import numpy as np

    params = convert_qwen2(state, cfg, prefix, dtype,
                           include_mlp=False)

    L, E = cfg.num_layers, cfg.num_experts
    mixtral = any("block_sparse_moe" in k for k in state)
    blk = "block_sparse_moe" if mixtral else "mlp"
    names = ("w1", "w3", "w2") if mixtral else \
        ("gate_proj", "up_proj", "down_proj")

    def t(key):
        a = state[key]
        if hasattr(a, "numpy"):
            a = a.numpy()
        return np.asarray(a, np.float32).T

    router, eg, eu, ed = [], [], [], []
    for i in range(L):
        lp = f"{prefix}layers.{i}.{blk}."
        router.append(t(lp + "gate.weight"))
        eg.append(np.stack([t(f"{lp}experts.{e}.{names[0]}.weight")
                            for e in range(E)]))
        eu.append(np.stack([t(f"{lp}experts.{e}.{names[1]}.weight")
                            for e in range(E)]))
        ed.append(np.stack([t(f"{lp}experts.{e}.{names[2]}.weight")
                            for e in range(E)]))
    layers = params["layers"]
    layers["router_w"] = jnp.asarray(np.stack(router), dtype)
    layers["e_gate"] = jnp.asarray(np.stack(eg), dtype)
    layers["e_up"] = jnp.asarray(np.stack(eu), dtype)
    layers["e_down"] = jnp.asarray(np.stack(ed), dtype)

    if cfg.shared_expert_intermediate_size:
        sg, su, sd, sr = [], [], [], []
        for i in range(L):
            lp = f"{prefix}layers.{i}.mlp."
            sg.append(t(lp + "shared_expert.gate_proj.weight"))
            su.append(t(lp + "shared_expert.up_proj.weight"))
            sd.append(t(lp + "shared_expert.down_proj.weight"))
            sr.append(t(lp + "shared_expert_gate.weight"))
        layers["s_gate_w"] = jnp.asarray(np.stack(sg), dtype)
        layers["s_up_w"] = jnp.asarray(np.stack(su), dtype)
        layers["s_down_w"] = jnp.asarray(np.stack(sd), dtype)
        layers["s_route_w"] = jnp.asarray(np.stack(sr), dtype)
    return params





def convert_mpt(state: Dict[str, Array], cfg: Qwen2Config,
                prefix: str = "transformer.",
                dtype=jnp.bfloat16) -> dict:
    """MptForCausalLM state dict -> params (reference wrapper:
    llava_mpt.py). Fused Wqkv [3D, D] splits into q/k/v; norms are
    weight-only LayerNorm; MLP is ungated up/act/down; head is tied
    to wte."""
    L, D = cfg.num_layers, cfg.hidden_size
    p = prefix

    def t(key):
        a = state[key]
        if hasattr(a, "numpy"):
            a = a.numpy()
        return np.asarray(a, np.float32)

    qw, kw, vw = [], [], []
    ow, up, down, ln1, ln2 = [], [], [], [], []
    for i in range(L):
        lp = f"{p}blocks.{i}."
        wqkv = t(lp + "attn.Wqkv.weight")          # [3D, D]
        qw.append(wqkv[:D].T)
        kw.append(wqkv[D:2 * D].T)
        vw.append(wqkv[2 * D:].T)
        ow.append(t(lp + "attn.out_proj.weight").T)
        up.append(t(lp + "ffn.up_proj.weight").T)
        down.append(t(lp + "ffn.down_proj.weight").T)
        ln1.append(t(lp + "norm_1.weight"))
        ln2.append(t(lp + "norm_2.weight"))

    layers = {
        "ln1": np.stack(ln1), "ln2": np.stack(ln2),
        "q_w": np.stack(qw), "k_w": np.stack(kw),
        "v_w": np.stack(vw), "o_w": np.stack(ow),
        "up_w": np.stack(up), "down_w": np.stack(down),
    }
    params = {
        "embed": t(p + "wte.weight"),
        "layers": layers,
        "final_norm": t(p + "norm_f.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight").T
    return _to_device(params, dtype)


def convert_siglip(state: Dict[str, Array], cfg: SigLIPConfig,
                   prefix: str = "vision_model.",
                   dtype=jnp.bfloat16) -> dict:
    L = cfg.num_layers   # 26: checkpoint's last layer dropped
    p = prefix
    D, P = cfg.hidden_size, cfg.patch_size
    conv = state[p + "embeddings.patch_embedding.weight"]  # [D, 3, P, P]
    patch_w = conv.reshape(D, 3 * P * P).T                 # [(C,ph,pw), D]

    lp = p + "encoder.layers.{}."
    layers = {
        "ln1_s": _stack(state, lp + "layer_norm1.weight", L),
        "ln1_b": _stack(state, lp + "layer_norm1.bias", L),
        "q_w": _stack(state, lp + "self_attn.q_proj.weight", L, True),
        "q_b": _stack(state, lp + "self_attn.q_proj.bias", L),
        "k_w": _stack(state, lp + "self_attn.k_proj.weight", L, True),
        "k_b": _stack(state, lp + "self_attn.k_proj.bias", L),
        "v_w": _stack(state, lp + "self_attn.v_proj.weight", L, True),
        "v_b": _stack(state, lp + "self_attn.v_proj.bias", L),
        "o_w": _stack(state, lp + "self_attn.out_proj.weight", L, True),
        "o_b": _stack(state, lp + "self_attn.out_proj.bias", L),
        "ln2_s": _stack(state, lp + "layer_norm2.weight", L),
        "ln2_b": _stack(state, lp + "layer_norm2.bias", L),
        "fc1_w": _stack(state, lp + "mlp.fc1.weight", L, True),
        "fc1_b": _stack(state, lp + "mlp.fc1.bias", L),
        "fc2_w": _stack(state, lp + "mlp.fc2.weight", L, True),
        "fc2_b": _stack(state, lp + "mlp.fc2.bias", L),
    }
    params = {
        "patch_w": patch_w,
        "patch_b": state[p + "embeddings.patch_embedding.bias"],
        "pos_embed": state[p + "embeddings.position_embedding.weight"],
        "layers": layers,
    }
    return _to_device(params, dtype)


def convert_projector(state: Dict[str, Array], projector_type: str,
                      prefix: str = "mm_projector.",
                      dtype=jnp.bfloat16) -> dict:
    """mlpNx_gelu: torch Sequential indices 0, 2, 4... are Linears."""
    from streamvln_tpu.models.projector import parse_type
    depth = parse_type(projector_type)
    layers = []
    for i in range(depth):
        idx = i * 2
        layers.append({
            "w": state[f"{prefix}{idx}.weight"].T,
            "b": state[f"{prefix}{idx}.bias"],
        })
    return _to_device({"layers": layers}, dtype)


def convert_streamvln(state: Dict[str, Array], cfg: StreamVLNConfig,
                      dtype=jnp.bfloat16) -> dict:
    """Full StreamVLN checkpoint (HF save of StreamVLNForCausalLM):
    LLM under 'model.', tower under
    'model.vision_tower.vision_tower.vision_model.', projector under
    'model.mm_projector.'."""
    out = {
        "llm": convert_qwen2(state, cfg.llm, prefix="model.", dtype=dtype),
        "vision": convert_siglip(
            state, cfg.vision,
            prefix="model.vision_tower.vision_tower.vision_model.",
            dtype=dtype),
        "projector": convert_projector(
            state, cfg.projector_type, prefix="model.mm_projector.",
            dtype=dtype),
    }
    # anyres row separator (llava_arch.py:109); absent in checkpoints
    # saved without the spatial_unpad merge — zeros keep the merge a
    # no-op-safe capability there
    if "model.image_newline" in state:
        out["image_newline"] = jnp.asarray(
            np.asarray(state["model.image_newline"]), dtype)
    else:
        out["image_newline"] = jnp.zeros(
            (cfg.llm.hidden_size,), dtype)
    return out


def _to_device(tree, dtype):
    import jax
    return jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), dtype=dtype), tree)


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, Array]:
    """Read all tensors from a HF checkpoint dir (safetensors or torch
    .bin shards) into numpy."""
    state: Dict[str, Array] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(f))
        return state
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"no checkpoint shards in {path}")


def load_streamvln_checkpoint(path: str, cfg: StreamVLNConfig,
                              dtype=jnp.bfloat16) -> dict:
    return convert_streamvln(load_state_dict(path), cfg, dtype)
