"""DDPO: denoising-diffusion policy optimization (TRL capability
breadth, final cell).

The reference vendors TRL's DDPOTrainer (reference:
trl/trainer/ddpo_trainer.py:55 — dormant there; imported by no script).
Semantics re-implemented TPU-native on optax/jit:

- DDIM step with Gaussian log-prob of the chosen prev_sample
  (trl/models/modeling_sd_base.py:227-303: epsilon-prediction posterior
  mean, eta-scaled DDIM variance, diagonal-Gaussian logprob averaged
  over latent dims).
- Clipped importance-ratio surrogate, advantage clamp, approx-KL and
  clipfrac diagnostics (trl/trainer/ddpo_trainer.py:325-404).
- PerPromptStatTracker advantage normalization
  (trl/trainer/utils.py:560-599).

The denoiser is a caller-supplied `apply(params, latents, t, embeds)
-> noise_pred` (the reference hardwires a StableDiffusion UNet; any
epsilon-prediction model trains here). Sampling runs as one lax.scan —
the whole trajectory is a single dispatch instead of a 50-step Python
loop.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# eta-scaled DDIM variance can hit exactly 0 at the final step
# (alpha_prod_prev == 1); clamp keeps the Gaussian log-prob finite so
# every timestep stays trainable.
_STD_FLOOR = 1e-5


def make_alphas_cumprod(num_timesteps: int = 1000,
                        beta_start: float = 8.5e-4,
                        beta_end: float = 1.2e-2) -> jnp.ndarray:
    """Standard linear-beta DDPM schedule -> cumulative alpha products."""
    betas = jnp.linspace(beta_start, beta_end, num_timesteps)
    return jnp.cumprod(1.0 - betas)


def ddim_step_logprob(noise_pred, t, t_prev, sample, alphas_cumprod,
                      eta: float = 1.0, prev_sample=None, key=None):
    """One DDIM step; returns (prev_sample, logprob-per-sample).

    With `prev_sample` given, scores it under the current policy's
    posterior (training); with `key` given, samples it (rollout).
    Log-prob is the mean over latent dims of the diagonal-Gaussian
    density, matching the reference exactly.
    """
    a_t = alphas_cumprod[t]
    a_prev = jnp.where(t_prev >= 0, alphas_cumprod[jnp.maximum(t_prev, 0)],
                       jnp.ones_like(a_t))
    bcast = (...,) + (None,) * (sample.ndim - 1)
    a_t, a_prev = a_t[bcast], a_prev[bcast]
    beta_t, beta_prev = 1.0 - a_t, 1.0 - a_prev

    pred_x0 = (sample - jnp.sqrt(beta_t) * noise_pred) / jnp.sqrt(a_t)
    variance = (beta_prev / beta_t) * (1.0 - a_t / a_prev)
    std = jnp.maximum(eta * jnp.sqrt(jnp.maximum(variance, 0.0)),
                      _STD_FLOOR)
    dir_xt = jnp.sqrt(jnp.maximum(beta_prev - std ** 2, 0.0)) * noise_pred
    mean = jnp.sqrt(a_prev) * pred_x0 + dir_xt

    if prev_sample is None:
        prev_sample = mean + std * jax.random.normal(key, sample.shape,
                                                     sample.dtype)
    logp = (-((jax.lax.stop_gradient(prev_sample) - mean) ** 2)
            / (2.0 * std ** 2)
            - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi))
    return prev_sample, logp.reshape(logp.shape[0], -1).mean(axis=1)


def sample_with_logprob(apply: Callable, params, key, x_t, timesteps,
                        embeds, alphas_cumprod, eta: float = 1.0):
    """Full DDIM rollout as one scan.

    Returns (latents [S+1, B, ...], next_latents [S, B, ...],
    logps [S, B]) — the training tuple DDPOTrainer collects per sample
    (ddpo_trainer.py:298: latents/next_latents/log_probs/timesteps).
    """
    t_prevs = jnp.concatenate([timesteps[1:], -jnp.ones((1,), jnp.int32)])

    def body(carry, inp):
        x, k = carry
        t, t_prev = inp
        k, sub = jax.random.split(k)
        eps = apply(params, x, jnp.full((x.shape[0],), t), embeds)
        x_next, logp = ddim_step_logprob(
            eps, t, t_prev, x, alphas_cumprod, eta, key=sub)
        return (x_next, k), (x, x_next, logp)

    (_, _), (lat, nxt, logps) = jax.lax.scan(
        body, (x_t, key), (timesteps, t_prevs))
    return lat, nxt, logps


class PerPromptStatTracker:
    """Per-prompt reward running stats -> normalized advantages
    (reference: trl/trainer/utils.py:560-599, identical semantics)."""

    def __init__(self, buffer_size: int = 32, min_count: int = 16):
        self.buffer_size = buffer_size
        self.min_count = min_count
        self.stats: Dict[str, deque] = {}

    def update(self, prompts, rewards) -> np.ndarray:
        prompts = np.asarray(prompts)
        rewards = np.asarray(rewards, dtype=np.float64)
        advantages = np.empty_like(rewards)
        for prompt in np.unique(prompts):
            sel = prompts == prompt
            buf = self.stats.setdefault(str(prompt),
                                        deque(maxlen=self.buffer_size))
            buf.extend(rewards[sel])
            if len(buf) < self.min_count:
                mean, std = rewards.mean(), rewards.std() + 1e-6
            else:
                mean, std = np.mean(buf), np.std(buf) + 1e-6
            advantages[sel] = (rewards[sel] - mean) / std
        return advantages


def ddpo_loss(advantages, clip_range, ratio):
    """Clipped surrogate (ddpo_trainer.py:391-404)."""
    unclipped = -advantages * ratio
    clipped = -advantages * jnp.clip(ratio, 1.0 - clip_range,
                                     1.0 + clip_range)
    return jnp.mean(jnp.maximum(unclipped, clipped))


class DDPOConfig(NamedTuple):
    clip_range: float = 1e-4
    adv_clip_max: float = 5.0
    eta: float = 1.0
    learning_rate: float = 3e-4
    max_grad_norm: float = 1.0


def make_ddpo_step(apply: Callable, alphas_cumprod,
                   cfg: DDPOConfig = DDPOConfig()):
    """Builds (optimizer, jitted step).

    Step consumes one unpacked timestep batch — the same post-rollout
    interface as DDPOTrainer._train_batched_samples: latents /
    next_latents / timesteps (+ prev) / old per-sample logps /
    per-sample advantages / prompt embeds.
    """
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adamw(cfg.learning_rate))

    def loss_fn(params, batch):
        eps = apply(params, batch["latents"], batch["timesteps"],
                    batch["embeds"])
        _, logp = ddim_step_logprob(
            eps, batch["timesteps"], batch["prev_timesteps"],
            batch["latents"], alphas_cumprod, cfg.eta,
            prev_sample=batch["next_latents"])
        adv = jnp.clip(batch["advantages"], -cfg.adv_clip_max,
                       cfg.adv_clip_max)
        ratio = jnp.exp(logp - batch["old_logps"])
        loss = ddpo_loss(adv, cfg.clip_range, ratio)
        approx_kl = 0.5 * jnp.mean((logp - batch["old_logps"]) ** 2)
        clipfrac = jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32))
        return loss, {"loss": loss, "approx_kl": approx_kl,
                      "clipfrac": clipfrac}

    @jax.jit
    def step(params, opt_state, batch) -> Tuple:
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return tx, step
