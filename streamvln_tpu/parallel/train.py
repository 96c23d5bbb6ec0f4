"""FSDP training runtime: optax optimizer with per-module LR groups,
remat, and a pjit-sharded train step.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-2/3 stack:
- per-module learning rates (mm_projector_lr / mm_vision_tower_lr param
  groups; reference: llava/train/llava_trainer.py:395-472)
- tunable-part freezing (reference: streamvln_train.py:1713-1770)
- ZeRO-style param/optimizer sharding -> 'fsdp' mesh axis sharding
  (reference: scripts/zero{2,3}.json)
- gradient checkpointing -> jax.checkpoint over the scanned layer stack
- bf16 training with f32 master weights kept implicitly (params dtype is
  the caller's choice; loss/grads accumulate in f32)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import streamvln
from streamvln_tpu.parallel import mesh as mesh_lib


def _finite_grads(grads):
    """Replace float0 grads (from int-typed leaves under allow_int)
    with scalar zeros so norm reductions work."""
    return jax.tree.map(
        lambda g: jnp.zeros((), jnp.float32)
        if g.dtype == jax.dtypes.float0 else g, grads)


def apply_updates(params, updates):
    """optax.apply_updates that passes int-typed (float0-update) leaves
    through untouched — quantized base weights stay frozen bit-exact."""
    return jax.tree.map(
        lambda p, u: p if u.dtype == jax.dtypes.float0
        else jnp.asarray(p + u).astype(jnp.asarray(p).dtype),
        params, updates)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror the reference run (scripts/streamvln_train_slurm.sh:
    55-68: lr 2e-5, tower lr 5e-6, cosine schedule, warmup 0.03)."""
    learning_rate: float = 2e-5
    vision_lr: Optional[float] = 5e-6
    projector_lr: Optional[float] = None   # None -> base lr
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_clip: float = 1.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    freeze_vision: bool = False
    freeze_projector: bool = False
    freeze_llm: bool = False
    lora_only: bool = False    # train only LoRA adapters (PEFT parity)
    # micro-batch accumulation (reference: bs 2 x grad-accum 2 per GPU,
    # scripts/streamvln_train_slurm.sh:55-60)
    grad_accum_steps: int = 1
    # sequence-chunked cross-entropy (None = full-seq logits); chunking
    # is what makes 32k-context training fit in HBM
    loss_chunk_size: Optional[int] = 512
    remat: bool = True
    # nested remat: layers per outer-checkpoint chunk (None = per-layer
    # boundaries). At 7B/32k the 28 per-layer residual-stream saves are
    # 6.6 GB — remat_chunk=7 keeps 4 and recomputes the rest.
    remat_chunk: Optional[int] = None
    # token-chunked MLP with per-chunk remat (exact): bounds the MLP's
    # [S, intermediate] fwd/bwd temps — at 7B/32k those f32 temps are
    # 2.3 GB each and are what breaks a 16 GB chip once remat_chunk has
    # handled the residual-stream saves.
    mlp_chunk: Optional[int] = None
    attn_impl: str = "auto"


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def _schedule(tcfg: TrainConfig, peak: float):
    warmup = max(int(tcfg.total_steps * tcfg.warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        0.0, peak, warmup, max(tcfg.total_steps, warmup + 1))


def _label_params(params, lora_only: bool = False):
    from streamvln_tpu.models.lora import is_lora_path

    def one(path, _):
        s = mesh_lib._path_str(path)
        if lora_only:
            return "lora" if is_lora_path(s) else "frozen"
        top = s.split("/")[0]
        return top if top in ("vision", "projector", "llm") else "llm"
    return jax.tree_util.tree_map_with_path(one, params)


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    def adamw(peak):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(_schedule(tcfg, peak), b1=tcfg.b1, b2=tcfg.b2,
                        eps=tcfg.eps, weight_decay=tcfg.weight_decay),
        )

    if tcfg.lora_only:
        transforms = {
            "lora": adamw(tcfg.learning_rate),
            "frozen": optax.set_to_zero(),
        }
        opt = optax.multi_transform(
            transforms, lambda p: _label_params(p, lora_only=True))
    else:
        transforms = {
            "vision": optax.set_to_zero() if tcfg.freeze_vision else
            adamw(tcfg.vision_lr or tcfg.learning_rate),
            "projector": optax.set_to_zero() if tcfg.freeze_projector
            else adamw(tcfg.projector_lr or tcfg.learning_rate),
            "llm": optax.set_to_zero() if tcfg.freeze_llm else
            adamw(tcfg.learning_rate),
        }
        opt = optax.multi_transform(transforms, _label_params)
    if tcfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, tcfg.grad_accum_steps)
    return opt


def create_train_state(params, tcfg: TrainConfig) -> TrainState:
    opt = make_optimizer(tcfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params))


def _normalize_state(state, mesh):
    """Move leaves committed outside the mesh (e.g. a checkpoint-restored
    scalar on one device) to replicated mesh placement so jit sees one
    consistent device set; meshed leaves pass through untouched."""
    if len(mesh.devices.flat) == 1:
        return state

    def one(x):
        sh = getattr(x, "sharding", None)
        if sh is None:
            return x
        if isinstance(sh, NamedSharding) and sh.mesh.devices.shape == \
                mesh.devices.shape:
            return x
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(one, state)


def state_shardings(state: TrainState, mesh):
    """NamedShardings read from the live state. Params are placed by
    shard_params; optax.init builds moment buffers with zeros_like, which
    inherits the param sharding — ZeRO-style optimizer partitioning for
    free. Host-side (numpy) leaves fall back to replicated."""
    def one(leaf):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and getattr(sh, "mesh", None) is not None \
                and not sh.is_fully_replicated:
            return sh
        return NamedSharding(mesh, P())
    return jax.tree.map(one, state)


def make_train_step(cfg: StreamVLNConfig, tcfg: TrainConfig, mesh):
    """Returns jitted (state, batch) -> (state, metrics). Batch dict:
    images [B,V,S,S,3] (preprocessed), token_ids/is_vision/vision_index/
    labels/valid [B,T], lengths [B]."""
    opt = make_optimizer(tcfg)

    def _freeze(params):
        """stop_gradient on frozen groups: avoids COMPUTING their
        (potentially multi-GB) cotangents only to zero them — the
        backward pass then only differentiates trainable leaves."""
        labels = _label_params(params, lora_only=tcfg.lora_only)
        frozen = {"frozen"}
        if tcfg.freeze_vision:
            frozen.add("vision")
        if tcfg.freeze_projector:
            frozen.add("projector")
        if tcfg.freeze_llm:
            frozen.add("llm")
        return jax.tree.map(
            lambda p, lab: jax.lax.stop_gradient(p) if lab in frozen
            else p, params, labels)

    def loss_fn(params, batch):
        params = _freeze(params)
        T = batch["token_ids"].shape[1]
        chunk = tcfg.loss_chunk_size
        if chunk is not None and T % chunk != 0:
            chunk = None   # odd bucket: fall back to full-seq loss
        loss, _ = streamvln.forward_train(
            params, cfg, batch["images"],
            {k: batch[k] for k in ("token_ids", "is_vision",
                                   "vision_index", "labels", "valid")},
            attn_impl=tcfg.attn_impl, remat=tcfg.remat,
            loss_chunk_size=chunk, remat_chunk=tcfg.remat_chunk,
            mlp_chunk=tcfg.mlp_chunk)
        return loss

    def step_fn(state: TrainState, batch):
        # allow_int: int8-quantized base weights get float0 grads, which
        # optax.set_to_zero / apply_updates pass through untouched
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.params)
        params = apply_updates(state.params, updates)
        gnorm = optax.global_norm(_finite_grads(grads))
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    compiled = {}

    def jit_step(state, batch):
        n_data = mesh.shape["dp"] * mesh.shape["fsdp"]
        B = next(iter(batch.values())).shape[0]
        if B % n_data != 0:
            raise ValueError(
                f"global batch size {B} must be divisible by "
                f"dp*fsdp = {n_data}")
        key = tuple(sorted(batch.keys()))
        if key not in compiled:
            # shardings ride on the (committed) input arrays rather than
            # explicit in_/out_shardings: state placed by shard_params
            # keeps its layout, batches are placed here once. (Explicit
            # jit shardings force a reshard pass per call on some
            # backends — measured 20x step overhead on tunneled chips.)
            compiled[key] = jax.jit(step_fn, donate_argnums=(0,))
        bspec = NamedSharding(mesh, mesh_lib.batch_spec())
        batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        state = _normalize_state(state, mesh)
        return compiled[key](state, batch)

    jit_step.compiled = compiled   # exposed for memory/cost inspection
    return jit_step
