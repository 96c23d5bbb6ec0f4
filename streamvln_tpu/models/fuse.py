"""Inference-time projection fusion: qkv and gate/up as single matmuls.

Decode-shape matmuls are launch-bound, not bandwidth-bound, below a few
MB: the round-3 amortized microbench measured the int8 [3584, 3584]
projection at 114 GB/s effective vs 372 GB/s for [3584, 18944] — the
small ops pay a fixed per-dot issue cost that dwarfs their bytes. Q, K
and V share the same input (as do gate and up), so concatenating their
weights along the OUTPUT dim turns 3 (resp. 2) launches into 1 with
byte-identical math: every output column of a dot is an independent
reduction, so `x @ [Wq|Wk|Wv]` computes exactly the per-projection
results. 7 projection ops per layer become 4.

The reference gets this for free inside fused CUDA attention wrappers
(flash-attn qkv packing, llava/train/llama_flash_attn_monkey_patch.py);
here it is an explicit params transform applied by the serving engine.

Works across weight dtypes because every quantization in models/quant.py
is per-output-column independent:
- float: plain concat;
- int8: concat weights and the [..., 1, dout] scales;
- packed int4: concat packed nibbles ([L, din/2, dout]) and the
  [L, G, dout] group scales — groups run along din, untouched.

Fusion is skipped for layers carrying LoRA adapters on the affected
projections (adapters are per-projection; fold them first with
models/lora.merge_lora) and for MoE layers (no dense gate/up stacks).

Memory: the fused arrays are CONCAT COPIES. If the caller keeps its
reference to the unfused tree, both live in HBM (~4 GB dead weight at
7B) — rebind to the returned tree (bench.py does) or construct the
engine with fuse_proj=False where the originals must stay alive (the
mid-training eval hook does).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

_QKV = ("q_w", "k_w", "v_w")
_GU = ("gate_w", "up_w")


def _concat_group(layers: Dict, names, out_name: str) -> bool:
    """Concat `names` (+ their _scale / _b satellites) along the output
    dim into `out_name`. Returns False (no-op) unless all members exist
    with matching dtype/satellite structure and no LoRA adapters."""
    ws = [layers.get(n) for n in names]
    if any(w is None for w in ws):
        return False
    if len({w.dtype for w in ws}) != 1:
        return False
    if any(n + "_lora_a" in layers for n in names):
        return False
    scales = [layers.get(n + "_scale") for n in names]
    if any((s is None) != (scales[0] is None) for s in scales):
        return False
    biases = [layers.get(n[:-2] + "_b") for n in names]
    if any((b is None) != (biases[0] is None) for b in biases):
        return False

    layers[out_name] = jnp.concatenate(ws, axis=-1)
    if scales[0] is not None:
        layers[out_name + "_scale"] = jnp.concatenate(scales, axis=-1)
    if biases[0] is not None:
        layers[out_name[:-2] + "_b"] = jnp.concatenate(biases, axis=-1)
    for n in names:
        del layers[n]
        layers.pop(n + "_scale", None)
        layers.pop(n[:-2] + "_b", None)
    return True


def fuse_projections(params: Dict) -> Dict:
    """Return params with per-layer q/k/v fused into `qkv_w` and
    gate/up into `gu_w` where possible (see module docstring). The
    input tree is not mutated; unfusable groups pass through.

    The VISION tower deliberately stays unfused: measured on v5e-1
    (scripts/vision_profile.py, batch 32) fusing the encoder's q/k/v
    into one [1152, 3456] dot made the tower 14.6 ms SLOWER per encode
    (174.3 -> 189.0 ms) — at [23328, 1152] the dots are compute-bound,
    not launch-bound, and the fused variant materializes a [B, S, 3D]
    intermediate (+split copies) that three separate dots with fused
    bias epilogues never write. Fusion pays only at decode shapes,
    where the per-dot issue cost dwarfs the bytes."""
    out = dict(params)
    llm = dict(out.get("llm", out))
    layers = dict(llm["layers"])
    _concat_group(layers, _QKV, "qkv_w")
    _concat_group(layers, _GU, "gu_w")
    llm["layers"] = layers
    if "llm" in out:
        out["llm"] = llm
        return out
    return llm
