"""DPO (Direct Preference Optimization) training step.

Capability parity with the reference's DPO path (reference:
llava/train/train_dpo.py + LLaVADPOTrainer over the vendored TRL subset,
llava/train/llava_trainer.py:505-566; only DPOTrainer +
DPODataCollatorWithPadding are exercised there).

Batch layout: the multimodal splice-layout arrays for the CHOSEN and
REJECTED completions share the prompt; per-sequence log-probs are summed
over unmasked (assistant) label positions. The reference policy is a
frozen second parameter tree (pass the pre-finetune params — or the
LoRA-merged base when adapters are trained).

loss = -log sigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r)))
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import streamvln, qwen2
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel.train import (
    TrainConfig, TrainState, _normalize_state, make_optimizer,
    state_shardings)
from streamvln_tpu.utils.constants import IGNORE_INDEX


def sequence_logprob(params, cfg: StreamVLNConfig, images, layout,
                     attn_impl="auto", remat=False):
    """Sum of per-token log p(label) over supervised positions, [B]."""
    vision_flat = streamvln.encode_frames(params, cfg, images, attn_impl)
    embeds = streamvln.splice_embeds(
        params, vision_flat, layout["token_ids"], layout["is_vision"],
        layout["vision_index"], cfg.llm)
    valid = layout["valid"]
    positions = jnp.where(valid, jnp.cumsum(valid, axis=1) - 1, 0)
    logits, _ = qwen2.forward(
        params["llm"], cfg.llm, embeds, positions, valid=valid,
        attn_impl=attn_impl, remat=remat)
    labels = layout["labels"][:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    mask = labels != IGNORE_INDEX
    tok_lp = jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask, axis=1)


def dpo_loss(policy_params, ref_params, cfg, batch, beta=0.1,
             attn_impl="auto", remat=False):
    def lp(params, side, stop_grad):
        layout = {k: batch[f"{side}_{k}"] for k in
                  ("token_ids", "is_vision", "vision_index", "labels",
                   "valid")}
        out = sequence_logprob(params, cfg, batch["images"], layout,
                               attn_impl, remat)
        return jax.lax.stop_gradient(out) if stop_grad else out

    pi_c = lp(policy_params, "chosen", False)
    pi_r = lp(policy_params, "rejected", False)
    ref_c = lp(ref_params, "chosen", True)
    ref_r = lp(ref_params, "rejected", True)
    logits = beta * ((pi_c - ref_c) - (pi_r - ref_r))
    loss = -jnp.mean(jax.nn.log_sigmoid(logits))
    acc = jnp.mean((logits > 0).astype(jnp.float32))
    margins = jnp.mean(beta * ((pi_c - ref_c)) - beta * (pi_r - ref_r))
    return loss, {"dpo_accuracy": acc, "reward_margin": margins}


def make_dpo_step(cfg: StreamVLNConfig, tcfg: TrainConfig, mesh,
                  beta: float = 0.1):
    """Returns jitted (state, ref_params, batch) -> (state, metrics)."""
    opt = make_optimizer(tcfg)

    def step_fn(state: TrainState, ref_params, batch):
        def loss_fn(params):
            return dpo_loss(params, ref_params, cfg, batch, beta,
                            tcfg.attn_impl, tcfg.remat)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.params)
        from streamvln_tpu.parallel.train import apply_updates
        params = apply_updates(state.params, updates)
        from streamvln_tpu.parallel.train import _finite_grads
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(_finite_grads(grads))}
        return TrainState(state.step + 1, params, opt_state), metrics

    compiled = {}

    def jit_step(state, ref_params, batch):
        key = tuple(sorted(batch.keys()))
        if key not in compiled:
            compiled[key] = jax.jit(step_fn, donate_argnums=(0,))
        bspec = NamedSharding(mesh, mesh_lib.batch_spec())
        batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        state = _normalize_state(state, mesh)
        return compiled[key](state, ref_params, batch)

    return jit_step


def make_dpo_batch(samples, cfg: StreamVLNConfig, length_buckets=None):
    """Collate DPO samples: each sample has chosen/rejected
    (input_ids, labels) pairs sharing `images`."""
    import numpy as np
    from streamvln_tpu.data.collate import (
        DEFAULT_LENGTH_BUCKETS, pick_bucket)
    from streamvln_tpu.models.streamvln import (
        build_splice_layout, stack_layouts)
    length_buckets = length_buckets or DEFAULT_LENGTH_BUCKETS
    tpf = cfg.tokens_per_frame

    def expanded(ids):
        n = 0
        for t in ids.tolist():
            n += tpf if t == -200 else \
                cfg.num_history * tpf if t == -300 else 1
        return n

    max_len = max(expanded(s[f"{side}_input_ids"])
                  for s in samples for side in ("chosen", "rejected"))
    bucket = pick_bucket(max_len, length_buckets)

    batch = {}
    for side in ("chosen", "rejected"):
        layouts = [build_splice_layout(
            s[f"{side}_input_ids"], cfg, labels=s[f"{side}_labels"],
            pad_to=bucket, max_frames=len(s["images"]))
            for s in samples]
        stacked = stack_layouts(layouts)
        del stacked["lengths"]
        batch.update({f"{side}_{k}": v for k, v in stacked.items()})

    V_max = max(len(s["images"]) for s in samples)
    S = samples[0]["images"].shape[1]
    images = np.zeros((len(samples), V_max, S, S, 3), np.float32)
    for i, s in enumerate(samples):
        images[i, : len(s["images"])] = s["images"]
    batch["images"] = images
    return batch
