"""PPO + reward-model training steps (TRL capability breadth).

The reference vendors a TRL subset (trl/trainer/: ppo_trainer.py,
reward_trainer.py, iterative_sft_trainer.py — dormant there; only
DPOTrainer is imported, llava/train/llava_trainer.py:10-11). This
module provides the TPU-native equivalents of the two non-trivial
trainers on the same mesh/optimizer stack as parallel/train.py:

- Reward model: scalar head over the final hidden state of the last
  real token; pairwise Bradley-Terry loss
  -log sigmoid(r_chosen - r_rejected) (trl/trainer/reward_trainer.py).
- PPO: clipped surrogate over per-token log-prob ratios with clipped
  value loss and entropy bonus, advantages via GAE
  (trl/trainer/ppo_trainer.py core math). Rollout generation is
  host-side (StreamingEngine / any generate loop); the step consumes
  (layout, response_mask, old_logp, values, advantages, returns), the
  same post-rollout interface as TRL's PPOTrainer.step.

Iterative SFT (trl/trainer/iterative_sft_trainer.py) is the plain SFT
step on caller-supplied batches — parallel/train.make_train_step covers
it directly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding

from streamvln_tpu.configs import StreamVLNConfig
from streamvln_tpu.models import qwen2, streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel.train import (TrainConfig, TrainState,
                                          _finite_grads,
                                          _normalize_state,
                                          apply_updates, make_optimizer)


# ---------------------------------------------------------------------------
# Shared: hidden states + per-token logp over a splice layout
# ---------------------------------------------------------------------------

def _forward_hidden(params, cfg: StreamVLNConfig, images, layout,
                    attn_impl="auto", remat=False):
    """Returns (normed hidden states [B, T, D])."""
    vision_flat = streamvln.encode_frames(params, cfg, images, attn_impl)
    embeds = streamvln.splice_embeds(
        params, vision_flat, layout["token_ids"], layout["is_vision"],
        layout["vision_index"], cfg.llm)
    valid = layout["valid"]
    positions = jnp.where(valid, jnp.cumsum(valid, axis=1) - 1, 0)
    hidden, _ = qwen2.forward(
        params["llm"], cfg.llm, embeds, positions, valid=valid,
        attn_impl=attn_impl, remat=remat, return_hidden=True)
    return hidden


def _logits_from_hidden(params, hidden):
    head = params["llm"].get("lm_head", params["llm"]["embed"].T)
    return jnp.dot(hidden.astype(jnp.float32),
                   head.astype(jnp.float32))


def token_logprobs(params, cfg, images, layout, attn_impl="auto",
                   remat=False):
    """log p(token_ids[t] | <t) at every position t>=1, [B, T-1]."""
    hidden = _forward_hidden(params, cfg, images, layout, attn_impl,
                             remat)
    logits = _logits_from_hidden(params, hidden)[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nxt = jnp.maximum(layout["token_ids"][:, 1:], 0)
    return jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# Reward model
# ---------------------------------------------------------------------------

def init_value_head(rng, cfg: StreamVLNConfig, dtype=jnp.float32):
    D = cfg.llm.hidden_size
    return {"w": jax.random.normal(rng, (D, 1), dtype) * D ** -0.5,
            "b": jnp.zeros((1,), dtype)}


def sequence_reward(params, head, cfg, images, layout, attn_impl="auto",
                    remat=False):
    """Scalar reward per sequence: value head at the last real token
    (trl reward/value models read the final position)."""
    hidden = _forward_hidden(params, cfg, images, layout, attn_impl,
                             remat)
    lengths = jnp.sum(layout["valid"].astype(jnp.int32), axis=1)
    last = jnp.take_along_axis(
        hidden, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return (jnp.dot(last.astype(jnp.float32),
                    head["w"].astype(jnp.float32))
            + head["b"].astype(jnp.float32))[:, 0]


def make_reward_step(cfg: StreamVLNConfig, tcfg: TrainConfig, mesh):
    """Pairwise reward-model step over (chosen_*, rejected_*) layouts
    sharing `images` (same batch shape as parallel/dpo.py). Trains the
    value head (and any unfrozen backbone groups)."""
    opt = make_optimizer(tcfg)
    head_opt = optax.adamw(tcfg.learning_rate)

    def step_fn(state: TrainState, head, head_opt_state, batch):
        def loss_fn(params, head):
            def r(side):
                layout = {k: batch[f"{side}_{k}"] for k in
                          ("token_ids", "is_vision", "vision_index",
                           "valid")}
                return sequence_reward(params, head, cfg,
                                       batch["images"], layout,
                                       tcfg.attn_impl, tcfg.remat)
            rc, rr = r("chosen"), r("rejected")
            loss = -jnp.mean(jax.nn.log_sigmoid(rc - rr))
            acc = jnp.mean((rc > rr).astype(jnp.float32))
            return loss, {"reward_accuracy": acc,
                          "reward_margin": jnp.mean(rc - rr)}

        (loss, aux), (gp, gh) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True,
            allow_int=True)(state.params, head)
        updates, opt_state = opt.update(gp, state.opt_state,
                                        state.params)
        params = apply_updates(state.params, updates)
        h_updates, head_opt_state = head_opt.update(gh, head_opt_state,
                                                    head)
        head = optax.apply_updates(head, h_updates)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(_finite_grads(gp))}
        return (TrainState(state.step + 1, params, opt_state), head,
                head_opt_state, metrics)

    compiled = {}

    def jit_step(state, head, head_opt_state, batch):
        key = tuple(sorted(batch.keys()))
        if key not in compiled:
            compiled[key] = jax.jit(step_fn, donate_argnums=(0,))
        bspec = NamedSharding(mesh, mesh_lib.batch_spec())
        batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        state = _normalize_state(state, mesh)
        return compiled[key](state, head, head_opt_state, batch)

    return jit_step, head_opt


# ---------------------------------------------------------------------------
# PPO
# ---------------------------------------------------------------------------

def compute_gae(rewards: np.ndarray, values: np.ndarray,
                mask: np.ndarray, gamma: float = 1.0,
                lam: float = 0.95) -> Tuple[np.ndarray, np.ndarray]:
    """Generalized advantage estimation over response tokens
    (trl/trainer/ppo_trainer.py compute_advantages). rewards/values/
    mask: [B, T]; positions with mask 0 contribute nothing. Returns
    (advantages, returns), advantages whitened over masked positions."""
    B, T = rewards.shape
    adv = np.zeros_like(rewards, np.float32)
    last = np.zeros((B,), np.float32)
    for t in range(T - 1, -1, -1):
        next_v = values[:, t + 1] if t + 1 < T else 0.0
        delta = rewards[:, t] + gamma * next_v - values[:, t]
        last = delta + gamma * lam * last
        adv[:, t] = last
        last = last * mask[:, t]
    adv = adv * mask
    returns = adv + values
    m = mask.sum() or 1.0
    mean = (adv * mask).sum() / m
    var = (((adv - mean) ** 2) * mask).sum() / m
    adv = (adv - mean) / np.sqrt(var + 1e-8) * mask
    return adv, returns


def make_ppo_step(cfg: StreamVLNConfig, tcfg: TrainConfig, mesh,
                  clip_ratio: float = 0.2, value_clip: float = 0.2,
                  vf_coef: float = 0.1, ent_coef: float = 0.0):
    """PPO policy+value step. Batch (all [B, T] unless noted):
    layout arrays (token_ids/is_vision/vision_index/valid), images,
    response_mask (1 on generated tokens, shifted to t>=1 frame:
    [B, T-1]), old_logp [B, T-1], old_values [B, T-1], advantages
    [B, T-1], returns [B, T-1]. Mirrors trl PPOTrainer.train_minibatch
    math (clipped surrogate + clipped value loss + entropy)."""
    opt = make_optimizer(tcfg)
    head_opt = optax.adamw(tcfg.learning_rate)

    def step_fn(state: TrainState, head, head_opt_state, batch):
        layout = {k: batch[k] for k in
                  ("token_ids", "is_vision", "vision_index", "valid")}
        mask = batch["response_mask"].astype(jnp.float32)
        n = jnp.maximum(mask.sum(), 1.0)

        def loss_fn(params, head):
            hidden = _forward_hidden(params, cfg, batch["images"],
                                     layout, tcfg.attn_impl, tcfg.remat)
            logits = _logits_from_hidden(params, hidden)[:, :-1]
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            nxt = jnp.maximum(layout["token_ids"][:, 1:], 0)
            logp = jnp.take_along_axis(logp_all, nxt[..., None],
                                       axis=-1)[..., 0]
            ratio = jnp.exp(logp - batch["old_logp"])
            adv = batch["advantages"]
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - clip_ratio, 1 + clip_ratio) * adv)
            pg_loss = (pg * mask).sum() / n

            values = (jnp.dot(hidden[:, :-1].astype(jnp.float32),
                              head["w"].astype(jnp.float32))
                      + head["b"].astype(jnp.float32))[..., 0]
            v_clip = batch["old_values"] + jnp.clip(
                values - batch["old_values"], -value_clip, value_clip)
            vf = jnp.maximum((values - batch["returns"]) ** 2,
                             (v_clip - batch["returns"]) ** 2)
            vf_loss = 0.5 * (vf * mask).sum() / n

            ent = -(jnp.exp(logp_all) * logp_all).sum(-1)
            ent_loss = -(ent * mask).sum() / n

            loss = pg_loss + vf_coef * vf_loss + ent_coef * ent_loss
            approx_kl = ((batch["old_logp"] - logp) * mask).sum() / n
            clipfrac = ((jnp.abs(ratio - 1) > clip_ratio)
                        .astype(jnp.float32) * mask).sum() / n
            return loss, {"pg_loss": pg_loss, "vf_loss": vf_loss,
                          "entropy": (ent * mask).sum() / n,
                          "approx_kl": approx_kl,
                          "clip_frac": clipfrac}

        (loss, aux), (gp, gh) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True,
            allow_int=True)(state.params, head)
        updates, opt_state = opt.update(gp, state.opt_state,
                                        state.params)
        params = apply_updates(state.params, updates)
        h_updates, head_opt_state = head_opt.update(gh, head_opt_state,
                                                    head)
        head = optax.apply_updates(head, h_updates)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(_finite_grads(gp))}
        return (TrainState(state.step + 1, params, opt_state), head,
                head_opt_state, metrics)

    compiled = {}

    def jit_step(state, head, head_opt_state, batch):
        key = tuple(sorted(batch.keys()))
        if key not in compiled:
            compiled[key] = jax.jit(step_fn, donate_argnums=(0,))
        bspec = NamedSharding(mesh, mesh_lib.batch_spec())
        batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        state = _normalize_state(state, mesh)
        return compiled[key](state, head, head_opt_state, batch)

    return jit_step, head_opt
