"""PPO + reward-model trainers (TRL capability breadth; reference
vendored trl/trainer/{ppo,reward}_trainer.py, dormant there)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import ppo
from streamvln_tpu.parallel.train import (TrainConfig,
                                          create_train_state)
from streamvln_tpu.utils.constants import IMAGE_TOKEN_INDEX


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_streamvln()
    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1,
                              devices=jax.devices()[:1])

    # fresh params per test: the jitted steps donate the train state,
    # so sharing one tree across tests would hand later tests deleted
    # buffers
    def make_params():
        return streamvln.init(jax.random.PRNGKey(0), cfg)
    return cfg, make_params, mesh


def _layout_batch(cfg, ids_list, pad_to=64):
    layouts = [streamvln.build_splice_layout(
        np.asarray(ids, np.int32), cfg, pad_to=pad_to)
        for ids in ids_list]
    stacked = streamvln.stack_layouts(layouts)
    del stacked["lengths"]
    return {k: jnp.asarray(v) for k, v in stacked.items()}


def test_compute_gae_shapes_and_whitening():
    B, T = 2, 6
    rng = np.random.default_rng(0)
    rewards = rng.standard_normal((B, T)).astype(np.float32)
    values = rng.standard_normal((B, T)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[:, :2] = 0          # prompt region
    adv, ret = ppo.compute_gae(rewards, values, mask)
    assert adv.shape == ret.shape == (B, T)
    assert np.all(adv[:, :2] == 0)
    m = adv[mask > 0]
    assert abs(m.mean()) < 1e-5 and abs(m.std() - 1) < 1e-2


@pytest.mark.slow
def test_reward_model_learns_preference(setup):
    cfg, make_params, mesh = setup
    tcfg = TrainConfig(learning_rate=5e-3, total_steps=20, remat=False,
                       warmup_ratio=0.0, freeze_vision=True)
    state = create_train_state(make_params(), tcfg)
    head = ppo.init_value_head(jax.random.PRNGKey(1), cfg)
    step, head_opt = ppo.make_reward_step(cfg, tcfg, mesh)
    head_opt_state = head_opt.init(head)

    S = cfg.vision.image_size
    images = jnp.zeros((2, 1, S, S, 3), jnp.float32)
    chosen = _layout_batch(cfg, [[7, IMAGE_TOKEN_INDEX, 5, 6, 9],
                                 [7, IMAGE_TOKEN_INDEX, 5, 6, 9]])
    rejected = _layout_batch(cfg, [[7, IMAGE_TOKEN_INDEX, 11, 12, 13],
                                   [7, IMAGE_TOKEN_INDEX, 11, 12, 13]])
    batch = {"images": images}
    batch.update({f"chosen_{k}": v for k, v in chosen.items()
                  if k != "labels"})
    batch.update({f"rejected_{k}": v for k, v in rejected.items()
                  if k != "labels"})

    losses = []
    for _ in range(8):
        state, head, head_opt_state, m = step(state, head,
                                              head_opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # preference being learned
    assert float(m["reward_accuracy"]) == 1.0


@pytest.mark.slow
def test_ppo_step_moves_policy_toward_advantage(setup):
    cfg, make_params, mesh = setup
    tcfg = TrainConfig(learning_rate=5e-3, total_steps=20, remat=False,
                       warmup_ratio=0.0, freeze_vision=True,
                       freeze_projector=True)
    state = create_train_state(make_params(), tcfg)
    head = ppo.init_value_head(jax.random.PRNGKey(2), cfg)
    step, head_opt = ppo.make_ppo_step(cfg, tcfg, mesh)
    head_opt_state = head_opt.init(head)

    S = cfg.vision.image_size
    images = jnp.zeros((2, 1, S, S, 3), jnp.float32)
    ids = [[7, IMAGE_TOKEN_INDEX, 5, 6, 9, 4, 3],
           [7, IMAGE_TOKEN_INDEX, 5, 6, 9, 4, 3]]
    layout = _layout_batch(cfg, ids, pad_to=32)
    batch = {k: v for k, v in layout.items() if k != "labels"}
    batch["images"] = images

    old_logp = np.asarray(ppo.token_logprobs(
        state.params, cfg, images,
        {k: layout[k] for k in ("token_ids", "is_vision",
                                "vision_index", "valid")}))
    T1 = old_logp.shape[1]
    mask = np.zeros((2, T1), np.float32)
    # response = last few real positions of the expanded sequence
    lengths = np.asarray(layout["valid"].sum(axis=1))
    for b in range(2):
        mask[b, int(lengths[b]) - 4: int(lengths[b]) - 1] = 1.0

    batch["response_mask"] = jnp.asarray(mask)
    batch["old_logp"] = jnp.asarray(old_logp)
    batch["old_values"] = jnp.zeros_like(batch["old_logp"])
    adv = np.zeros_like(mask)
    adv[mask > 0] = 1.0                      # uniformly positive
    batch["advantages"] = jnp.asarray(adv)
    batch["returns"] = jnp.asarray(adv)

    for _ in range(3):
        state, head, head_opt_state, m = step(state, head,
                                              head_opt_state, batch)
    for k in ("loss", "pg_loss", "vf_loss", "approx_kl", "clip_frac"):
        assert np.isfinite(float(m[k])), (k, m[k])

    new_logp = np.asarray(ppo.token_logprobs(
        state.params, cfg, images,
        {k: layout[k] for k in ("token_ids", "is_vision",
                                "vision_index", "valid")}))
    # positive advantage -> response-token log-probs go up
    assert (new_logp[mask > 0].mean()) > (old_logp[mask > 0].mean())
