"""Batched multi-env generation == sequential per-env generation."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.streaming.engine import StreamingEngine


def _turn(tok, text, add_system):
    ids, _ = chatml.tokenize_dialogue(tok, [("user", text)],
                                      add_system=add_system,
                                      with_labels=False)
    return np.concatenate([ids, np.asarray(chatml.generation_prompt(tok),
                                           np.int32)])


@pytest.mark.slow
def test_batched_matches_sequential():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()

    def mk():
        return StreamingEngine(
            params, cfg, n_envs=3, stop_ids=(tok.im_end_id,),
            compute_dtype=jnp.float32, max_new_tokens=5,
            cache_capacity=1024, buckets=(512, 768, 1024))

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (48, 64, 3), np.uint8)
              for _ in range(3)]
    prompts = ["go to the chair", "turn around", "exit the room"]
    turns = [_turn(tok, chatml.observation_prompt(None, p), True)
             for p in prompts]

    seq_engine = mk()
    seq_out = {e: seq_engine.generate(e, frames[e], turns[e], step_id=0)
               for e in range(3)}

    bat_engine = mk()
    bat_out = bat_engine.generate_batch(
        [(e, frames[e], turns[e], 0, ()) for e in range(3)])
    assert bat_out == seq_out

    # second round (continuation turns) also matches, incl. pending token
    cont = [_turn(tok, chatml.observation_prompt(None, ""), False)
            for _ in range(3)]
    seq2 = {e: seq_engine.generate(e, frames[e], cont[e], step_id=2)
            for e in range(3)}
    bat2 = bat_engine.generate_batch(
        [(e, frames[e], cont[e], 2, ()) for e in range(3)])
    assert bat2 == seq2


def test_batched_subset_of_envs():
    """Only some envs active: inactive rows' caches untouched."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=3, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=1024, buckets=(512, 768))
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    t = _turn(tok, chatml.observation_prompt(None, "hello"), True)
    engine.generate_batch([(0, frame, t, 0, ()), (2, frame, t, 0, ())])
    lengths = np.asarray(engine.cache.length)
    assert lengths[0] > 0 and lengths[2] > 0 and lengths[1] == 0


def test_partial_batch_preserves_inactive_feat_cache():
    """Inactive rows must not clobber their step-0 feature-cache slot
    (their meta zeros used to route the dummy-frame encoding to slot 0;
    it now lands in the reserved scratch slot)."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=3, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768))
    rng = np.random.RandomState(2)
    t0 = _turn(tok, chatml.observation_prompt(None, "hello"), True)
    frames = [rng.randint(0, 255, (48, 64, 3), np.uint8)
              for _ in range(3)]
    engine.generate_batch([(e, frames[e], t0, 0, ()) for e in range(3)])
    before = np.asarray(engine.feat_cache[1, 0])
    assert np.abs(before).max() > 0

    # partial batch: env 1 inactive
    t1 = _turn(tok, chatml.observation_prompt(None, ""), False)
    engine.generate_batch([(0, frames[0], t1, 1, ()),
                           (2, frames[2], t1, 1, ())])
    after = np.asarray(engine.feat_cache[1, 0])
    np.testing.assert_array_equal(before, after)
    # scratch slot (last) is never handed out to active envs
    assert all(s < engine.feat_slots
               for st in engine.envs for s in st.frame_slots.values())


def test_async_double_dispatch_raises():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=2, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768))
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    t = _turn(tok, chatml.observation_prompt(None, "hi"), True)
    h = engine.generate_batch_async([(0, frame, t, 0, ())])
    import pytest
    with pytest.raises(RuntimeError, match="uncollected"):
        engine.generate_batch_async([(0, frame, t, 1, ())])
    # a different env is fine while env 0 is in flight
    h2 = engine.generate_batch_async([(1, frame, t, 0, ())])
    engine.collect(h)
    engine.collect(h2)
    # after collect, env 0 can dispatch again
    t1 = _turn(tok, chatml.observation_prompt(None, ""), False)
    engine.generate_batch([(0, frame, t1, 1, ())])


def test_reset_reclaims_feature_slots():
    """Engine reuse across episodes via reset(): frame slots must be
    reclaimed (reference reset(env_num) is a full per-env reset,
    stream_video_vln.py:473-479)."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=1, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768), feat_slots=2)
    rng = np.random.RandomState(4)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    for episode in range(3):   # 3 episodes x 2 frames > 2 slots
        t0 = _turn(tok, chatml.observation_prompt(None, "go"), True)
        engine.generate(0, frame, t0, step_id=0)
        t1 = _turn(tok, chatml.observation_prompt(None, ""), False)
        engine.generate(0, frame, t1, step_id=1)
        engine.reset()
        assert engine.envs[0].next_slot == 0
        assert not engine.envs[0].frame_slots
        assert engine.envs[0].pending_token is None


@pytest.mark.slow
def test_idle_env_kv_survives_other_envs_big_prefill():
    """An idle env whose KV sits past (capacity - pad_to) must be
    untouched by another env's padded-bucket prefill: the dummy write
    for idle rows used to get its start CLAMPED by
    dynamic_update_slice and smash the idle env's live low slots
    (write_mask self-copy regression)."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()

    def mk():
        return StreamingEngine(
            params, cfg, n_envs=2, stop_ids=(tok.im_end_id,),
            compute_dtype=jnp.float32, max_new_tokens=4,
            cache_capacity=1024, buckets=(128, 768))

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (48, 64, 3), np.uint8)
              for _ in range(8)]
    fB = rng.randint(0, 255, (48, 64, 3), np.uint8)
    t0 = _turn(tok, chatml.observation_prompt(None, "go ahead"), True)
    t1 = _turn(tok, chatml.observation_prompt(None, ""), False)
    # env 1's prompt is long enough to force the 768 bucket
    tb = _turn(tok, chatml.observation_prompt(
        None, "navigate " * 40), True)

    def fill_a(eng):
        eng.generate(0, frames[0], t0, step_id=0)
        i = 1
        while eng.envs[0].kv_length <= 1024 - 768:
            eng.generate(0, frames[i], t1, step_id=4 * i)
            i += 1
            assert i < 8, "fill loop runaway"
        return i

    ctrl = mk()
    n = fill_a(ctrl)
    want = ctrl.generate(0, frames[n], t1, step_id=4 * n)

    eng = mk()
    assert fill_a(eng) == n
    # env 1's call carries a 768-wide padded dummy write for idle env 0
    # at an offset that clamps (kv_length > capacity - 768)
    eng.generate(1, fB, tb, step_id=0)
    got = eng.generate(0, frames[n], t1, step_id=4 * n)
    assert list(got) == list(want), f"idle env corrupted: {got} != {want}"


def test_async_validation_failure_leaves_engine_reusable():
    """A bucket/overflow rejection must not poison the envs: the
    inflight mark and feature slots are only taken after ALL requests
    validate (regression: mutate-then-raise bricked the env)."""
    import pytest
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    eng = StreamingEngine(
        params, cfg, n_envs=2, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=800, buckets=(768,))
    rng = np.random.RandomState(4)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    t0 = _turn(tok, chatml.observation_prompt(None, "go"), True)
    t1 = _turn(tok, chatml.observation_prompt(None, ""), False)

    eng.generate(0, frame, t0, step_id=0)    # fits: 0 + 768 + slack
    with pytest.raises(RuntimeError, match="overflow"):
        # second turn: kv_length + the padded 768 write > 800
        eng.generate(0, frame, t1, step_id=4)
    # env 0 must still be usable after the rejection
    eng.reset_for_env(0)
    toks = eng.generate(0, frame, t0, step_id=0)
    assert len(toks) >= 1
    # and env 1 was never affected
    toks1 = eng.generate(1, frame, t0, step_id=0)
    assert len(toks1) >= 1


def test_capacity_full_idle_row_shadow_survives_spec_loop():
    """Regression: a capacity-full IDLE row's token-id shadow must come
    through another env's speculative call bit-identical. The spec
    while-loop writes [cur, drafts] at each row's (frozen, clamped)
    offset every iteration — unmasked, that overwrites the idle row's
    live trailing shadow slots with dummy ids and silently degrades its
    later speculative acceptance (advisor r4 + review r5 finding)."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=2, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=1024, buckets=(512, 768), spec_lookup=3)
    rng = np.random.RandomState(4)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    t0 = _turn(tok, chatml.observation_prompt(None, "hello"), True)
    engine.generate_batch([(e, frame, t0, 0, ()) for e in range(2)])

    # force env 1 into the capacity-full state (cache length at cap,
    # shadow fully live) without replaying a 1024-token dialogue
    cap = engine.cache.capacity
    marker = np.arange(cap, dtype=np.int32) % 7 + 100
    engine.ids_buf = engine.ids_buf.at[1].set(jnp.asarray(marker))
    engine.cache = type(engine.cache)(
        engine.cache.k, engine.cache.v,
        engine.cache.length.at[1].set(cap),
        engine.cache.k_scale, engine.cache.v_scale)

    t1 = _turn(tok, chatml.observation_prompt(None, ""), False)
    engine.generate_batch([(0, frame, t1, 1, ())])   # env 1 idle

    np.testing.assert_array_equal(np.asarray(engine.ids_buf[1]), marker)
    assert int(engine.cache.length[1]) == cap
