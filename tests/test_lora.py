"""LoRA adapters: zero-init identity, merge parity, adapter-only train."""
import jax
import jax.numpy as jnp
import numpy as np

from streamvln_tpu.configs import tiny_llm, tiny_streamvln
from streamvln_tpu.models import lora, qwen2, streamvln


def _logits(params, cfg, ids):
    x = qwen2.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    out, _ = qwen2.forward(params, cfg, x, pos, attn_impl="dense")
    return out


def test_zero_init_is_identity():
    cfg = tiny_llm()
    base = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                             cfg.vocab_size)
    ref = _logits(base, cfg, ids)
    with_lora = lora.add_lora({"llm": base}, jax.random.PRNGKey(2), cfg,
                              rank=4)["llm"]
    out = _logits(with_lora, cfg, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_merge_matches_runtime_adapters():
    cfg = tiny_llm()
    base = qwen2.init(jax.random.PRNGKey(0), cfg)
    params = lora.add_lora({"llm": base}, jax.random.PRNGKey(2), cfg,
                           rank=4)
    # give B nonzero values so adapters actually do something
    layers = params["llm"]["layers"]
    for k in list(layers):
        if k.endswith("_lora_b"):
            layers[k] = jax.random.normal(
                jax.random.PRNGKey(hash(k) % 2**31), layers[k].shape
            ) * 0.02
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                             cfg.vocab_size)
    runtime = _logits(params["llm"], cfg, ids)
    merged = lora.merge_lora(params)
    assert not any("_lora_" in k for k in merged["llm"]["layers"])
    folded = _logits(merged["llm"], cfg, ids)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(runtime),
                               rtol=2e-4, atol=2e-4)
    # adapters changed the function vs base
    base_out = _logits(base, cfg, ids)
    assert np.abs(np.asarray(runtime) - np.asarray(base_out)).max() > 1e-4


def test_split_roundtrip():
    cfg = tiny_llm()
    params = lora.add_lora(
        {"llm": qwen2.init(jax.random.PRNGKey(0), cfg)},
        jax.random.PRNGKey(1), cfg, rank=2)
    base, adapters = lora.split_lora(params)
    assert not any("_lora_" in k for k in base["llm"]["layers"])
    assert len(adapters["layers"]) == 2 * len(lora.DEFAULT_TARGETS)


def test_lora_only_training_freezes_base():
    from streamvln_tpu.parallel import mesh as mesh_lib
    from streamvln_tpu.parallel import train as train_lib
    from streamvln_tpu.utils.constants import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    params = lora.add_lora(params, jax.random.PRNGKey(1), cfg.llm, rank=2)
    tcfg = train_lib.TrainConfig(learning_rate=1e-2, total_steps=10,
                                 remat=False, lora_only=True)
    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, tp=1,
                              devices=jax.devices()[:1])
    state = train_lib.create_train_state(params, tcfg)
    step = train_lib.make_train_step(cfg, tcfg, mesh)

    ids = np.array([7, IMAGE_TOKEN_INDEX, 5, 6], np.int32)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 5, 6], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg, labels=labels,
                                           pad_to=16)
    batch = {k: jnp.asarray(v) for k, v in
             streamvln.stack_layouts([layout]).items() if k != "lengths"}
    S = cfg.vision.image_size
    batch["images"] = jnp.zeros((1, 1, S, S, 3), jnp.float32)

    before_base = np.asarray(state.params["llm"]["layers"]["q_w"])
    # with B=0 init only B receives gradient on the first step
    before_lora = np.asarray(
        state.params["llm"]["layers"]["q_w_lora_b"])
    state, m = step(state, batch)   # warmup step: lr 0
    state, m = step(state, batch)
    after_base = np.asarray(state.params["llm"]["layers"]["q_w"])
    after_lora = np.asarray(state.params["llm"]["layers"]["q_w_lora_b"])
    np.testing.assert_array_equal(before_base, after_base)
    assert np.abs(after_lora - before_lora).max() > 0


def test_adapter_npz_roundtrip_matches_live_adapters(tmp_path):
    """Export adapters (train.py format), re-attach with
    apply_adapters_npz on fresh base params, merge: forward must match
    the live-adapter model exactly (reference 'lora' builder dispatch,
    llava/model/builder.py:40-80)."""
    import numpy as np

    from streamvln_tpu.configs import tiny_llm
    from streamvln_tpu.models import lora as lora_lib
    from streamvln_tpu.models import qwen2

    cfg = tiny_llm()
    base = {"llm": qwen2.init(jax.random.PRNGKey(0), cfg, jnp.float32)}
    live = lora_lib.add_lora(base, jax.random.PRNGKey(1), cfg, rank=4,
                             alpha=8.0)
    # make adapters non-trivial (B starts at zero)
    layers = dict(live["llm"]["layers"])
    for k in list(layers):
        if k.endswith("_lora_b"):
            layers[k] = jax.random.normal(jax.random.PRNGKey(2),
                                          layers[k].shape) * 0.05
    live = dict(live)
    live["llm"] = dict(live["llm"])
    live["llm"]["layers"] = layers

    _, adapters = lora_lib.split_lora(live)
    flat = {k: np.asarray(v) for k, v in adapters["layers"].items()}
    flat["lora_scale"] = np.asarray(adapters["lora_scale"])
    path = tmp_path / "lora_adapters.npz"
    np.savez(path, **flat)

    reloaded = lora_lib.merge_lora(
        lora_lib.apply_adapters_npz(base, str(path)))
    merged_live = lora_lib.merge_lora(live)

    x = jax.random.normal(jax.random.PRNGKey(3),
                          (1, 8, cfg.hidden_size), jnp.float32)
    pos = jnp.arange(8)[None]
    a, _ = qwen2.forward(merged_live["llm"], cfg, x, pos)
    b, _ = qwen2.forward(reloaded["llm"], cfg, x, pos)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
