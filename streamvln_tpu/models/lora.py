"""LoRA adapters for the Qwen2 stack (functional, scan-compatible).

Reference capability: PEFT LoRA fine-tuning of the LLM with adapter-only
checkpoints (reference: streamvln_train.py:1613-1632, 1860-1870;
llava/train/llava_trainer.py:474-502).

Design: adapter matrices live INSIDE the layer-stack pytree
(`params['llm']['layers']['<w>_lora_a' / '_lora_b']`, stacked on the [L]
axis) so `lax.scan` threads them with zero model-code branching cost;
qwen2._layer_step applies `x @ A @ B * (alpha / rank)` whenever the keys
are present. Training only the adapters is an optimizer-label concern
(parallel.train.TrainConfig.lora_only)."""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from streamvln_tpu.configs import Qwen2Config

DEFAULT_TARGETS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def add_lora(params: dict, rng: jax.Array, cfg: Qwen2Config,
             rank: int = 16, alpha: float = 32.0,
             targets: Sequence[str] = DEFAULT_TARGETS,
             dtype=jnp.float32) -> dict:
    """Insert zero-initialized adapters (A ~ N(0, 1/in), B = 0 — so the
    initial model is exactly the base model)."""
    layers = dict(params["llm"]["layers"])
    keys = jax.random.split(rng, len(targets))
    for key, name in zip(keys, targets):
        if name not in layers:
            continue   # family variants (MoE has e_* expert stacks
            # instead of gate_w/up_w/down_w; adapters go on attention)
        w = layers[name]                      # [L, din, dout]
        L, din, dout = w.shape
        layers[f"{name}_lora_a"] = (
            jax.random.normal(key, (L, din, rank), jnp.float32)
            * (din ** -0.5)).astype(dtype)
        layers[f"{name}_lora_b"] = jnp.zeros((L, rank, dout), dtype)
    out = dict(params)
    out["llm"] = dict(params["llm"])
    out["llm"]["layers"] = layers
    out["llm"]["lora_scale"] = jnp.asarray(alpha / rank, jnp.float32)
    return out


def merge_lora(params: dict) -> dict:
    """Fold adapters into the base weights (inference/export)."""
    llm = params["llm"]
    if "lora_scale" not in llm:
        return params
    scale = llm["lora_scale"]
    layers = dict(llm["layers"])
    for name in list(layers):
        if name.endswith("_lora_a"):
            base = name[: -len("_lora_a")]
            a = layers.pop(name)
            b = layers.pop(base + "_lora_b")
            delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scale
            w = layers[base]
            if w.dtype == jnp.int8:
                # dequantize, fold, requantize (a raw int8 cast would
                # silently truncate the merged weights)
                from streamvln_tpu.models.quant import quantize_weight
                wf = w.astype(jnp.float32) * layers[base + "_scale"]
                q, sc = quantize_weight(wf + delta)
                layers[base] = q
                layers[base + "_scale"] = sc
            elif w.dtype == jnp.uint8:
                from streamvln_tpu.models.quant import (
                    dequant_int4, quantize_weight_int4)
                wf = dequant_int4(w, layers[base + "_scale"],
                                  jnp.float32)
                q, sc = quantize_weight_int4(wf + delta)
                layers[base] = q
                layers[base + "_scale"] = sc
            else:
                layers[base] = (w.astype(jnp.float32)
                                + delta).astype(w.dtype)
    out = dict(params)
    out["llm"] = {k: v for k, v in llm.items() if k != "lora_scale"}
    out["llm"]["layers"] = layers
    return out


def split_lora(params: dict) -> Tuple[dict, dict]:
    """(base_params, adapter_only) for adapter-only checkpointing."""
    llm = params["llm"]
    layers = llm["layers"]
    adapters = {k: v for k, v in layers.items() if "_lora_" in k}
    base_layers = {k: v for k, v in layers.items() if "_lora_" not in k}
    base = dict(params)
    base["llm"] = {k: v for k, v in llm.items() if k != "lora_scale"}
    base["llm"]["layers"] = base_layers
    return base, {"layers": adapters,
                  "lora_scale": llm.get("lora_scale")}


def apply_adapters_npz(params: dict, path: str) -> dict:
    """Attach adapters exported by train.py (lora_adapters.npz) onto a
    base parameter tree — the inference-side 'lora' model-builder
    dispatch (reference: llava/model/builder.py:40-80 loads the PEFT
    adapters + non-lora trainables and merges). Call merge_lora() after
    to fold them for serving."""
    import numpy as np
    data = np.load(path)
    layers = dict(params["llm"]["layers"])
    for k in data.files:
        if k == "lora_scale":
            continue
        layers[k] = jnp.asarray(data[k])
    out = dict(params)
    out["llm"] = dict(params["llm"])
    out["llm"]["layers"] = layers
    out["llm"]["lora_scale"] = jnp.asarray(data["lora_scale"])
    return out


def is_lora_path(path_str: str) -> bool:
    return "_lora_" in path_str or path_str.endswith("lora_scale")
