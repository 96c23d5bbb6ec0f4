"""FSDP mesh training tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import streamvln
from streamvln_tpu.parallel import mesh as mesh_lib
from streamvln_tpu.parallel import train as train_lib
from streamvln_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def _make_batch(cfg, B=8, T=32, seed=0):
    rng = np.random.RandomState(seed)
    layouts = []
    for _ in range(B):
        ids = np.array([7, IMAGE_TOKEN_INDEX, 5, 6, 8, 9], np.int32)
        labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 5, 6, 8, 9],
                          np.int32)
        layouts.append(streamvln.build_splice_layout(
            ids, cfg, labels=labels, pad_to=T))
    batch = {k: jnp.asarray(v) for k, v in
             streamvln.stack_layouts(layouts).items()}
    batch.pop("lengths")
    S = cfg.vision.image_size
    batch["images"] = jnp.asarray(
        rng.rand(B, 1, S, S, 3).astype(np.float32))
    return batch


def test_mesh_construction():
    mesh = mesh_lib.make_mesh(dp=2, fsdp=4, tp=1)
    assert mesh.shape == {"dp": 2, "fsdp": 4, "tp": 1}


def test_param_specs_divisibility():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=8, tp=1)
    specs = mesh_lib.param_specs(params, mesh)
    # every sharded axis must divide evenly
    def check(path, leaf, spec):
        for i, ax in enumerate(tuple(spec)):
            if ax is not None:
                axes = ax if isinstance(ax, tuple) else (ax,)
                total = int(np.prod([mesh.shape[a] for a in axes]))
                assert leaf.shape[i] % total == 0, (path, leaf.shape, spec)
    jax.tree_util.tree_map_with_path(
        lambda p, l, s: check(p, l, s), params, specs)


def test_train_step_runs_and_loss_decreases():
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(learning_rate=1e-3, total_steps=50,
                                 remat=True)
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(dp=2, fsdp=4, tp=1)
    params = mesh_lib.shard_params(params, mesh)
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)
    batch = _make_batch(cfg)

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_sharded_matches_single_device():
    """One FSDP step == one single-device step (same grads/updates)."""
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(learning_rate=1e-3, total_steps=50,
                                 remat=False)
    batch = _make_batch(cfg)

    # single device (init is deterministic; re-init per mesh because the
    # train step donates its input state)
    mesh1 = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1,
                               devices=jax.devices()[:1])
    s1 = train_lib.create_train_state(
        streamvln.init(jax.random.PRNGKey(0), cfg), tcfg)
    step1 = train_lib.make_train_step(cfg, tcfg, mesh1)
    s1, m1 = step1(s1, batch)

    # 8-way fsdp+dp
    mesh8 = mesh_lib.make_mesh(dp=2, fsdp=4, tp=1)
    p8 = mesh_lib.shard_params(
        streamvln.init(jax.random.PRNGKey(0), cfg), mesh8)
    s8 = train_lib.create_train_state(p8, tcfg)
    step8 = train_lib.make_train_step(cfg, tcfg, mesh8)
    s8, m8 = step8(s8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_frozen_vision_params_unchanged():
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(learning_rate=1e-2, total_steps=50,
                                 freeze_vision=True, remat=False)
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=8, tp=1)
    params = mesh_lib.shard_params(params, mesh)
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)
    before = jax.tree.map(np.asarray, state.params["vision"])
    state, _ = step(state, _make_batch(cfg))
    after = jax.tree.map(np.asarray, state.params["vision"])
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_chunked_loss_matches_full():
    """Sequence-chunked CE == full-logits CE (value and gradients)."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg, B=2, T=32)
    layout = {k: batch[k] for k in ("token_ids", "is_vision",
                                    "vision_index", "labels", "valid")}

    def loss_full(p):
        return streamvln.forward_train(p, cfg, batch["images"],
                                       layout)[0]

    def loss_chunked(p):
        return streamvln.forward_train(p, cfg, batch["images"], layout,
                                       loss_chunk_size=8)[0]

    lf, gf = jax.value_and_grad(loss_full)(params)
    lc, gc = jax.value_and_grad(loss_chunked)(params)
    np.testing.assert_allclose(float(lf), float(lc), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_moe_train_step_on_mesh():
    """Expert-parallel sharding: MoE LLM params shard over the tp axis
    (experts) + fsdp (matmul dims) and a train step runs."""
    import dataclasses
    cfg = tiny_streamvln()
    moe_llm = dataclasses.replace(
        cfg.llm, num_experts=4, num_experts_per_tok=2,
        shared_expert_intermediate_size=64)
    cfg = dataclasses.replace(cfg, llm=moe_llm)
    tcfg = train_lib.TrainConfig(learning_rate=1e-3, total_steps=10,
                                 remat=True)
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    assert "e_gate" in params["llm"]["layers"]
    mesh = mesh_lib.make_mesh(dp=1, fsdp=4, tp=2)
    params = mesh_lib.shard_params(params, mesh)
    # experts sharded over tp: 4 experts / tp2 = 2 per group
    spec = mesh_lib.param_specs(params, mesh)["llm"]["layers"]["e_gate"]
    assert spec[1] == "tp"
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)
    batch = _make_batch(cfg, B=4)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_quantized_and_fused_param_sharding_rules():
    """int8/int4 storage keeps weight names, so the tp/fsdp rules
    apply unchanged; scales follow their weight's output-dim axis and
    fused qkv_w/gu_w (models/fuse.py) shard like their members."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from streamvln_tpu.configs import tiny_llm
    from streamvln_tpu.models import quant, qwen2
    from streamvln_tpu.models.fuse import fuse_projections
    from streamvln_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2, devices=jax.devices())
    cfg = tiny_llm()
    params = {"llm": qwen2.init(jax.random.PRNGKey(0), cfg,
                                jnp.float32)}
    params = quant.quantize_llm(params, bits=4)
    params["llm"] = fuse_projections(params["llm"])
    specs = mesh_lib.param_specs(params, mesh)
    layers = specs["llm"]["layers"]
    got = {k: tuple(v) for k, v in layers.items()
           if k in ("qkv_w", "gu_w", "down_w", "qkv_w_scale",
                    "down_w_scale")}
    D = cfg.hidden_size
    # tiny dims may not divide the mesh axes; compare against the
    # fitted spec rather than the raw rule
    raw = {"qkv_w": P(None, "fsdp", "tp"), "gu_w": P(None, "fsdp", "tp"),
           "down_w": P(None, "tp", "fsdp"),
           "qkv_w_scale": P(None, None, "tp"),
           "down_w_scale": P(None, None, "fsdp")}
    for k, spec in raw.items():
        arr = params["llm"]["layers"][k]
        fitted = tuple(mesh_lib._fit_spec(spec, arr.shape, mesh))
        assert got[k] == fitted, (k, got[k], fitted)
    # placement works end to end
    sharded = mesh_lib.shard_params(params, mesh)
    assert sharded["llm"]["layers"]["qkv_w"].dtype == jnp.uint8
