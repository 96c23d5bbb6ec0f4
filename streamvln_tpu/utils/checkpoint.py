"""Orbax checkpointing of the sharded train state + HF-format export.

Replaces the reference's checkpoint stack (HF Trainer epoch saves,
ZeRO-3 16-bit gather on save, FSDP FULL_STATE_DICT; reference:
streamvln_train.py:75-87, 152-229, scripts/zero3.json:27):

- save/restore are async-capable Orbax ops on the sharded TrainState —
  each host writes its own shards, no gather
- `export_hf` produces a reference-compatible HF state dict (inverse of
  models/convert_hf) so checkpoints interchange with the PyTorch stack
- `resume_latest` mirrors Trainer's resume_from_checkpoint-if-exists
  (streamvln_train.py:1852-1855)
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _mngr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(directory: str, state, step: int,
                    max_to_keep: int = 3, wait: bool = False):
    import orbax.checkpoint as ocp
    mngr = _mngr(os.path.abspath(directory), max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mngr.wait_until_finished()
    return mngr


def latest_step(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if re.fullmatch(r"\d+", name):
            steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(directory: str, target, step: Optional[int] = None):
    """Restore into the structure/shardings of `target` (an abstract or
    concrete TrainState)."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    mngr = _mngr(directory)
    return mngr.restore(step, args=ocp.args.StandardRestore(target))


def resume_latest(directory: str, state):
    """Return (state, step) — restored if a checkpoint exists, else the
    given fresh state at step 0."""
    step = latest_step(directory)
    if step is None:
        return state, 0
    return restore_checkpoint(directory, state, step), step


# ---------------------------------------------------------------------------
# HF-format export (inverse of models/convert_hf)
# ---------------------------------------------------------------------------

def export_hf(params: dict, cfg) -> dict:
    """streamvln_tpu params -> HF StreamVLNForCausalLM state dict
    ({name: np.ndarray}); consumable by the PyTorch reference after
    torch.tensor conversion. Int8-quantized leaves are dequantized
    (value * scale) first — HF checkpoints must never carry raw int8
    integers without their scales."""
    import jax.numpy as jnp

    from streamvln_tpu.models.quant import dequantize_llm

    if any(getattr(leaf, "dtype", None) == jnp.int8
           for leaf in jax.tree_util.tree_leaves(params["llm"])):
        params = dequantize_llm(params)
    out = {}

    def put(name, arr):
        out[name] = np.asarray(jax.device_get(arr), np.float32)

    if "image_newline" in params:
        put("model.image_newline", params["image_newline"])
    llm = params["llm"]
    put("model.embed_tokens.weight", llm["embed"])
    put("model.norm.weight", llm["final_norm"])
    if "lm_head" in llm:
        put("lm_head.weight", np.asarray(
            jax.device_get(llm["lm_head"])).T)
    lay = llm["layers"]
    L = lay["ln1"].shape[0]
    for i in range(L):
        p = f"model.layers.{i}."
        put(p + "input_layernorm.weight", lay["ln1"][i])
        put(p + "self_attn.q_proj.weight",
            np.asarray(jax.device_get(lay["q_w"][i])).T)
        put(p + "self_attn.q_proj.bias", lay["q_b"][i])
        put(p + "self_attn.k_proj.weight",
            np.asarray(jax.device_get(lay["k_w"][i])).T)
        put(p + "self_attn.k_proj.bias", lay["k_b"][i])
        put(p + "self_attn.v_proj.weight",
            np.asarray(jax.device_get(lay["v_w"][i])).T)
        put(p + "self_attn.v_proj.bias", lay["v_b"][i])
        put(p + "self_attn.o_proj.weight",
            np.asarray(jax.device_get(lay["o_w"][i])).T)
        put(p + "post_attention_layernorm.weight", lay["ln2"][i])
        put(p + "mlp.gate_proj.weight",
            np.asarray(jax.device_get(lay["gate_w"][i])).T)
        put(p + "mlp.up_proj.weight",
            np.asarray(jax.device_get(lay["up_w"][i])).T)
        put(p + "mlp.down_proj.weight",
            np.asarray(jax.device_get(lay["down_w"][i])).T)

    vis = params["vision"]
    vp = "model.vision_tower.vision_tower.vision_model."
    D = cfg.vision.hidden_size
    P = cfg.vision.patch_size
    put(vp + "embeddings.patch_embedding.weight",
        np.asarray(jax.device_get(vis["patch_w"])).T.reshape(D, 3, P, P))
    put(vp + "embeddings.patch_embedding.bias", vis["patch_b"])
    put(vp + "embeddings.position_embedding.weight", vis["pos_embed"])
    vl = vis["layers"]
    names = [("ln1_s", "layer_norm1.weight", False),
             ("ln1_b", "layer_norm1.bias", False),
             ("q_w", "self_attn.q_proj.weight", True),
             ("q_b", "self_attn.q_proj.bias", False),
             ("k_w", "self_attn.k_proj.weight", True),
             ("k_b", "self_attn.k_proj.bias", False),
             ("v_w", "self_attn.v_proj.weight", True),
             ("v_b", "self_attn.v_proj.bias", False),
             ("o_w", "self_attn.out_proj.weight", True),
             ("o_b", "self_attn.out_proj.bias", False),
             ("ln2_s", "layer_norm2.weight", False),
             ("ln2_b", "layer_norm2.bias", False),
             ("fc1_w", "mlp.fc1.weight", True),
             ("fc1_b", "mlp.fc1.bias", False),
             ("fc2_w", "mlp.fc2.weight", True),
             ("fc2_b", "mlp.fc2.bias", False)]
    for i in range(vl["ln1_s"].shape[0]):
        for ours, theirs, transpose in names:
            arr = np.asarray(jax.device_get(vl[ours][i]))
            put(vp + f"encoder.layers.{i}.{theirs}",
                arr.T if transpose else arr)

    for i, lp in enumerate(params["projector"]["layers"]):
        put(f"model.mm_projector.{i * 2}.weight",
            np.asarray(jax.device_get(lp["w"])).T)
        put(f"model.mm_projector.{i * 2}.bias", lp["b"])
    return out


def save_hf(params: dict, cfg, directory: str):
    """Write the exported state dict as safetensors."""
    from safetensors.numpy import save_file
    os.makedirs(directory, exist_ok=True)
    save_file(export_hf(params, cfg),
              os.path.join(directory, "model.safetensors"))
