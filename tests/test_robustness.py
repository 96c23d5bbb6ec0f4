"""Fault-tolerance surfaces: retry ladder, grad accumulation, KV
overflow guard + host shadow length parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.collate import RobustDataset
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.streaming.engine import StreamingEngine


class Flaky:
    """Raises on some indices / first attempts."""
    def __init__(self):
        self.calls = {}
    def __len__(self):
        return 10
    def __getitem__(self, i):
        self.calls[i] = self.calls.get(i, 0) + 1
        if i == 3 and self.calls[i] < 3:
            raise OSError("transient")
        if i == 5:
            raise ValueError("always broken")
        return i


def test_retry_same_index():
    ds = RobustDataset(Flaky())
    assert ds[3] == 3            # succeeds on 3rd same-index attempt
    assert ds.calls[3] == 3


def test_retry_neighbor_fallback():
    ds = RobustDataset(Flaky())
    assert ds[5] == 6            # falls to neighbour 6


def test_retry_exhaustion():
    class AlwaysBad:
        def __len__(self): return 4
        def __getitem__(self, i): raise ValueError("nope")
    with pytest.raises(RuntimeError, match="neighbours all failed"):
        RobustDataset(AlwaysBad())[0]


@pytest.mark.slow
def test_grad_accum_updates_only_on_boundary():
    from streamvln_tpu.parallel import mesh as mesh_lib
    from streamvln_tpu.parallel import train as train_lib
    from streamvln_tpu.utils.constants import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    cfg = tiny_streamvln()
    tcfg = train_lib.TrainConfig(learning_rate=1e-2, total_steps=10,
                                 grad_accum_steps=2, remat=False,
                                 warmup_ratio=0.0)
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
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

    p0 = np.asarray(state.params["llm"]["layers"]["q_w"])
    state, _ = step(state, batch)      # micro-step 1: accumulate only
    p1 = np.asarray(state.params["llm"]["layers"]["q_w"])
    np.testing.assert_array_equal(p0, p1)
    state, _ = step(state, batch)      # boundary 1 (warmup lr=0)
    state, _ = step(state, batch)      # micro-step 3: accumulate only
    p3 = np.asarray(state.params["llm"]["layers"]["q_w"])
    np.testing.assert_array_equal(p0, p3)
    state, _ = step(state, batch)      # boundary 2: real update
    p4 = np.asarray(state.params["llm"]["layers"]["q_w"])
    assert np.abs(p4 - p3).max() > 0


def _turn(tok, text, add_system=True):
    ids, _ = chatml.tokenize_dialogue(tok, [("user", text)],
                                      add_system=add_system,
                                      with_labels=False)
    return np.concatenate([ids, np.asarray(chatml.generation_prompt(tok),
                                           np.int32)])


def test_kv_overflow_guard_and_shadow_parity():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=1024, buckets=(512, 768, 1024))
    frame = np.zeros((48, 64, 3), np.uint8)
    t = _turn(tok, chatml.observation_prompt(None, "walk"), True)
    engine.generate(0, frame, t, step_id=0)
    # host shadow == device length
    assert engine.envs[0].kv_length == int(engine.cache.length[0])
    t2 = _turn(tok, chatml.observation_prompt(None, ""), False)
    engine.generate(0, frame, t2, step_id=2)
    assert engine.envs[0].kv_length == int(engine.cache.length[0])

    # force an overflow: keep generating until the guard trips
    with pytest.raises(RuntimeError, match="overflow"):
        for step in range(4, 64, 2):
            engine.generate(0, frame, t2, step_id=step)
