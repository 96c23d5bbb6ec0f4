"""DDPO trainer (TRL breadth, final cell; reference
trl/trainer/ddpo_trainer.py:55 + trl/models/modeling_sd_base.py —
dormant there). Validates the DDIM log-prob math, the per-prompt
advantage tracker, and that the clipped-surrogate step actually
improves reward on a toy denoiser."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.parallel import ddpo

DIM, EMB, STEPS, T = 4, 2, 8, 64


def _apply(params, x, t, embeds):
    """Toy epsilon-model: linear in (x, t/T, embeds)."""
    feats = jnp.concatenate(
        [x, (t[:, None] / T).astype(x.dtype), embeds], axis=1)
    return jnp.tanh(feats @ params["w1"]) @ params["w2"]


def _init(key):
    k1, k2 = jax.random.split(key)
    return {"w1": jax.random.normal(k1, (DIM + 1 + EMB, 16)) * 0.3,
            "w2": jax.random.normal(k2, (16, DIM)) * 0.3}


def _timesteps():
    return jnp.linspace(T - 1, 0, STEPS).astype(jnp.int32)


def test_ddim_step_score_matches_sample():
    """Scoring the just-sampled prev_sample returns the sampling-time
    log-prob (the rollout/training interfaces agree)."""
    ac = ddpo.make_alphas_cumprod(T)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, DIM))
    eps = jax.random.normal(jax.random.PRNGKey(1), (3, DIM))
    prev, logp_sample = ddpo.ddim_step_logprob(
        eps, jnp.full((3,), 40), jnp.full((3,), 30), x, ac,
        key=jax.random.PRNGKey(2))
    _, logp_score = ddpo.ddim_step_logprob(
        eps, jnp.full((3,), 40), jnp.full((3,), 30), x, ac,
        prev_sample=prev)
    np.testing.assert_allclose(np.asarray(logp_sample),
                               np.asarray(logp_score), rtol=1e-5)


def test_per_prompt_stat_tracker():
    """Once a prompt's buffer reaches min_count, advantages are
    normalized by that prompt's own stats (utils.py:577-593)."""
    tr = ddpo.PerPromptStatTracker(buffer_size=16, min_count=4)
    prompts = np.array(["a", "a", "b", "b"])
    tr.update(prompts, np.array([1.0, 2.0, 10.0, 20.0]))
    adv = tr.update(prompts, np.array([1.0, 2.0, 10.0, 20.0]))
    # prompt a buffer = [1,2,1,2]: mean 1.5, std 0.5 -> adv = [-1, 1]
    np.testing.assert_allclose(adv[:2], [-1.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(adv[2:], [-1.0, 1.0], atol=1e-3)


def test_ddpo_improves_reward():
    """Full loop: rollout (scan) -> per-prompt advantages -> clipped
    surrogate steps -> mean reward strictly improves.

    Reward: negative distance of the final latent from a per-prompt
    target — the toy analogue of the reference's aesthetic scorer."""
    ac = ddpo.make_alphas_cumprod(T)
    params = _init(jax.random.PRNGKey(0))
    cfg = ddpo.DDPOConfig(clip_range=0.2, learning_rate=5e-3)
    _, step = ddpo.make_ddpo_step(_apply, ac, cfg)
    tx, _ = ddpo.make_ddpo_step(_apply, ac, cfg)
    opt_state = tx.init(params)
    tracker = ddpo.PerPromptStatTracker(buffer_size=64, min_count=8)
    targets = jnp.array([[1.5, -1.5, 1.5, -1.5], [-1.5, 1.5, -1.5, 1.5]])
    ts = _timesteps()
    t_prevs = jnp.concatenate([ts[1:], -jnp.ones((1,), jnp.int32)])
    B = 16

    def rollout(params, key):
        kx, ks = jax.random.split(key)
        pid = jax.random.bernoulli(kx, shape=(B,)).astype(jnp.int32)
        embeds = jax.nn.one_hot(pid, EMB)
        x_t = jax.random.normal(kx, (B, DIM))
        lat, nxt, logps = ddpo.sample_with_logprob(
            _apply, params, ks, x_t, ts, embeds, ac)
        reward = -jnp.linalg.norm(nxt[-1] - targets[pid], axis=1)
        return pid, embeds, lat, nxt, logps, reward

    rollout = jax.jit(rollout)
    rewards_by_epoch = []
    key = jax.random.PRNGKey(42)
    metrics = {}
    for epoch in range(14):
        key, k = jax.random.split(key)
        pid, embeds, lat, nxt, logps, reward = rollout(params, k)
        rewards_by_epoch.append(float(reward.mean()))
        adv = tracker.update(np.asarray(pid), np.asarray(reward))
        adv = jnp.asarray(adv, jnp.float32)
        for s in range(STEPS):  # every timestep trains, as in the ref
            batch = {"latents": lat[s], "next_latents": nxt[s],
                     "timesteps": jnp.full((B,), ts[s]),
                     "prev_timesteps": jnp.full((B,), t_prevs[s]),
                     "old_logps": logps[s], "advantages": adv,
                     "embeds": embeds}
            params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(metrics["loss"])
    assert float(metrics["approx_kl"]) >= 0.0
    early = np.mean(rewards_by_epoch[:3])
    late = np.mean(rewards_by_epoch[-3:])
    assert late > early + 0.3, (early, late, rewards_by_epoch)
