"""Streaming engine parity: incremental KV-cached multi-turn generation
must match a naive full-recompute reference, including across window
boundaries with the slow-memory path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import qwen2, streamvln
from streamvln_tpu.ops.preprocess import preprocess_frames
from streamvln_tpu.streaming.engine import StreamingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    return cfg, params, tok


def make_engine(cfg, params, tok, **kw):
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("max_new_tokens", 6)
    kw.setdefault("cache_capacity", 2048)
    kw.setdefault("buckets", (128, 256, 512, 768, 1024))
    return StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,), **kw)


class NaiveDialogue:
    """Ground-truth reference: full recompute each decode step, no cache.

    Keeps the full token stream (with sentinels) + all frames; each next
    token = argmax over a from-scratch forward of the whole dialogue.
    """

    def __init__(self, cfg, params, tok, max_new):
        self.cfg, self.params, self.tok = cfg, params, tok
        self.max_new = max_new
        self.ids = []        # full dialogue ids incl sentinels
        self.frames = []     # uint8 frames in sentinel consumption order

    def generate(self, frame_u8, turn_ids, history_frames=()):
        # history frames are consumed by <memory> BEFORE the current
        # frame's <image>; mirror that order in the frame list
        self.frames.extend(history_frames)
        self.frames.append(frame_u8)
        self.ids.extend(int(t) for t in turn_ids)
        out = []
        for _ in range(self.max_new):
            nxt = self._next_token()
            out.append(nxt)
            self.ids.append(nxt)
            if nxt == self.tok.im_end_id:
                break
        return out

    def _next_token(self):
        cfg, params = self.cfg, self.params
        frames = np.stack(self.frames)
        pixels = preprocess_frames(jnp.asarray(frames),
                                   cfg.vision.image_size,
                                   dtype=jnp.float32)
        vision = streamvln.encode_frames(params, cfg, pixels[None])
        layout = streamvln.build_splice_layout(
            np.asarray(self.ids, np.int32), cfg)
        batch = streamvln.stack_layouts([layout])
        embeds = streamvln.splice_embeds(
            params, vision, jnp.asarray(batch["token_ids"]),
            jnp.asarray(batch["is_vision"]),
            jnp.asarray(batch["vision_index"]))
        pos = jnp.arange(layout.length)[None]
        logits, _ = qwen2.forward(params["llm"], cfg.llm, embeds, pos)
        return int(jnp.argmax(logits[0, -1]))


def _turn(tok, text, add_system):
    ids, _ = chatml.tokenize_dialogue(tok, [("user", text)],
                                      add_system=add_system,
                                      with_labels=False)
    return np.concatenate([ids, np.asarray(chatml.generation_prompt(tok),
                                           np.int32)])


@pytest.mark.slow
def test_multiturn_parity_no_memory(setup):
    """3 dialogue turns, one frame each: engine == naive recompute."""
    cfg, params, tok = setup
    engine = make_engine(cfg, params, tok)
    naive = NaiveDialogue(cfg, params, tok, max_new=6)
    rng = np.random.RandomState(0)

    for call in range(3):
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        text = chatml.observation_prompt(None, "walk ahead" if call == 0
                                         else "")
        ids = _turn(tok, text, add_system=(call == 0))
        got = engine.generate(0, frame, ids, step_id=call *
                              cfg.num_future_steps)
        want = naive.generate(frame, ids)
        assert got == want, f"call {call}: {got} != {want}"


@pytest.mark.slow
def test_window_boundary_memory_parity(setup):
    """Boundary call with <memory>: gathered cached features must equal
    fresh re-encode (the naive path re-encodes history frames)."""
    cfg, params, tok = setup
    engine = make_engine(cfg, params, tok)
    naive = NaiveDialogue(cfg, params, tok, max_new=6)
    rng = np.random.RandomState(1)
    nf, nfs, nh = cfg.num_frames, cfg.num_future_steps, cfg.num_history

    frames = {}
    # one window of calls (steps 0, 2, 4, 6 for tiny cfg nf=8 nfs=2)
    for call in range(nf // nfs):
        step = call * nfs
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        frames[step] = frame
        text = chatml.observation_prompt(
            None, "go to the door" if call == 0 else "")
        ids = _turn(tok, text, add_system=(call == 0))
        got = engine.generate(0, frame, ids, step_id=step)
        want = naive.generate(frame, ids)
        assert got == want, f"call {call}: {got} != {want}"

    # window reset
    engine.reset_for_env(0)
    naive2 = NaiveDialogue(cfg, params, tok, max_new=6)

    # boundary call at step nf with memory
    step = nf
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    hist_steps = list(range(0, nf, nf // nh))
    base = "go to the door You have visited these areas <memory>."
    text = chatml.observation_prompt(None, base)
    ids = _turn(tok, text, add_system=True)
    got = engine.generate(0, frame, ids, step_id=step,
                          history_steps=hist_steps)
    want = naive2.generate(frame, ids,
                           history_frames=[frames[s] for s in hist_steps])
    assert got == want, f"boundary: {got} != {want}"


def test_agent_smoke_33_steps(setup):
    """Reference-style smoke run (streamvln_agent.py:312-320) extended
    across the window boundary; every model call returns actions."""
    cfg, params, tok = setup
    engine = make_engine(cfg, params, tok)
    agent = VLNAgent(engine, tok)
    rng = np.random.RandomState(2)

    queue = []
    calls = 0
    for step in range(2 * cfg.num_frames + 1):
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        run_model = len(queue) == 0
        actions, gen_t, text = agent.step(0, frame, "move forward",
                                          run_model=run_model)
        if run_model:
            assert actions is not None and len(actions) >= 1
            queue = list(actions)[:cfg.num_future_steps]
            calls += 1
        queue.pop(0) if queue else None
    assert calls >= 3


def test_engine_rejects_oversized_prompt(setup):
    cfg, params, tok = setup
    engine = make_engine(cfg, params, tok, buckets=(64,))
    ids = np.asarray(tok.encode("x" * 100), np.int32)
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        engine.generate(0, np.zeros((48, 64, 3), np.uint8), ids, step_id=0)


def test_backfill_smoke_and_feature_parity(setup):
    """backfill() must not crash (round-2 regression: fused_pre missing
    from _encode_store's static_argnames made EVERY call raise
    TracerBoolConversionError) and must store the exact features a
    normal generate call would store for the same frame."""
    cfg, params, tok = setup
    rng = np.random.RandomState(5)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)

    eng_bf = make_engine(cfg, params, tok)
    eng_bf.backfill(0, frame, step_id=0)
    assert eng_bf.envs[0].frame_slots == {0: 0}

    eng_gen = make_engine(cfg, params, tok)
    ids = _turn(tok, chatml.observation_prompt(None, "go"),
                add_system=True)
    eng_gen.generate(0, frame, ids, step_id=0)
    slot = eng_gen.envs[0].frame_slots[0]
    np.testing.assert_array_equal(
        np.asarray(eng_bf.feat_cache[0, 0]),
        np.asarray(eng_gen.feat_cache[0, slot]))


def test_backfill_fused_pre_smoke(setup):
    """The fused preprocess flavor of backfill compiles and runs."""
    cfg, params, tok = setup
    eng = make_engine(cfg, params, tok, fused_preprocess=True)
    frame = np.zeros((48, 64, 3), np.uint8)
    eng.backfill(0, frame, step_id=3)
    assert eng.envs[0].frame_slots == {3: 0}


@pytest.mark.parametrize("emit", [3, 5])
@pytest.mark.slow
def test_misaligned_window_backfill_parity(setup, emit):
    """The LLM emitting != num_future_steps actions desyncs model calls
    from window boundaries: the first post-reset call then lands at a
    step not divisible by num_frames. The reference's intent (memory
    clause whenever output_ids is None and step != 0,
    streamvln_eval.py:295-297) is followed: history is injected from
    time_ids[0] and frames that never saw a model call are backfilled.
    Engine tokens must match a full-recompute naive dialogue that
    re-encodes the history frames fresh."""
    cfg, params, tok = setup
    engine = make_engine(cfg, params, tok)
    agent = VLNAgent(engine, tok)

    backfills = []
    orig_backfill = engine.backfill_batch

    def spy(env, frames_u8, step_ids):
        backfills.extend(
            s for s in step_ids
            if s not in engine.envs[env].frame_slots)
        return orig_backfill(env, frames_u8, step_ids)
    engine.backfill_batch = spy

    rng = np.random.RandomState(6)
    frames = {}
    naive = NaiveDialogue(cfg, params, tok, max_new=6)
    queue = []
    misaligned_memory_calls = 0
    for step in range(4 * cfg.num_frames + 2):
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        frames[step] = frame
        if queue:
            queue.pop(0)
            agent.step(0, frame, run_model=False)
            if (step + 1) % cfg.num_frames == 0:
                naive = None        # window reset: fresh dialogue
            continue
        req = agent.prepare_model_step(0, frame, "find the chair")
        env, f, turn_ids, step_id, history = req["request"]
        assert step_id == step
        if history and step % cfg.num_frames != 0:
            misaligned_memory_calls += 1
        got = engine.generate(env, f, turn_ids, step_id, history)
        agent.finish_model_step(0)
        if naive is None:
            naive = NaiveDialogue(cfg, params, tok, max_new=6)
        want = naive.generate(frame, turn_ids,
                              [frames[s] for s in history])
        assert got == want, f"step {step}: {got} != {want}"
        queue = [1] * emit
        queue.pop(0)
        if (step + 1) % cfg.num_frames == 0:
            # model call ON the boundary: finish_model_step resets
            # (the deployed reference resets every boundary,
            # streamvln_eval.py:346-350); mirror in the oracle
            naive = None

    assert misaligned_memory_calls >= 2
    assert backfills, "expected at least one backfilled history frame"


def test_chunked_decode_matches_single_call(setup):
    """Token-streaming chunk primitive: generate(budget 4) followed by
    continue_decode() chunks must reproduce generate(budget 12)
    token-for-token, and the dialogue state after the chunked stream
    must support an identical next turn."""
    cfg, params, tok = setup
    eng_one = make_engine(cfg, params, tok, max_new_tokens=12)
    eng_chunk = make_engine(cfg, params, tok, max_new_tokens=4)
    rng = np.random.RandomState(9)
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    ids = _turn(tok, chatml.observation_prompt(None, "turn left"),
                add_system=True)

    want = eng_one.generate(0, frame, ids, step_id=0)
    got = eng_chunk.generate(0, frame, ids, step_id=0)
    while len(got) < 12 and got[-1] != tok.im_end_id:
        chunk = eng_chunk.continue_decode(0)
        if not chunk:
            break
        got.extend(chunk)
    assert got[:len(want)] == want, f"{got} != {want}"

    # follow-up turn: bookkeeping (pending token, kv_length) after the
    # chunked stream must leave the dialogue in the same state
    frame2 = rng.randint(0, 255, (48, 64, 3), np.uint8)
    ids2 = _turn(tok, chatml.observation_prompt(None, ""),
                 add_system=False)
    if len(got) == len(want):
        a = eng_one.generate(0, frame2, ids2, step_id=2)
        b = eng_chunk.generate(0, frame2, ids2, step_id=2)
        while len(b) < 12 and b[-1] != tok.im_end_id:
            chunk = eng_chunk.continue_decode(0)
            if not chunk:
                break
            b.extend(chunk)
        assert b[:len(a)] == a, f"follow-up: {b} != {a}"


def test_padded_bucket_write_guard(setup):
    """The prefill writes the full padded bucket at each row's KV
    offset; dynamic_update_slice CLAMPS an out-of-range start, silently
    shifting the write over valid low slots (reproduced as token
    corruption vs a large-capacity engine). The overflow guard must
    therefore reject calls where offset + pad_to exceeds capacity —
    loudly, not corruptly."""
    cfg, params, tok = setup
    eng = make_engine(cfg, params, tok, cache_capacity=1100,
                      buckets=(768,), max_new_tokens=4)
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (32, 32, 3), np.uint8)
    first = chatml.observation_prompt(None, "navigate to the kitchen")
    with pytest.raises(RuntimeError, match="padded"):
        for step in range(16):
            text = first if step == 0 else chatml.observation_prompt(
                None, "")
            ids, _ = chatml.tokenize_dialogue(
                tok, [("user", text)], add_system=(step == 0))
            ids = np.concatenate(
                [ids, chatml.generation_prompt(tok)]).astype(np.int32)
            eng.generate(0, frame, ids, step)


def test_spec_lookup_decode_exactness(setup):
    """Prompt-lookup speculative decoding is greedy-EXACT: a
    spec_lookup engine must emit identical tokens to the plain greedy
    engine across multi-turn calls, a window boundary with <memory>,
    and continue_decode chunks — with identical KV bookkeeping."""
    cfg, params, tok = setup
    greedy = make_engine(cfg, params, tok, max_new_tokens=8)
    spec = make_engine(cfg, params, tok, max_new_tokens=8,
                       spec_lookup=4)
    rng = np.random.RandomState(3)
    nf, nfs, nh = cfg.num_frames, cfg.num_future_steps, cfg.num_history

    frames = {}
    for call in range(nf // nfs):
        step = call * nfs
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        frames[step] = frame
        text = chatml.observation_prompt(
            None, "walk to the window" if call == 0 else "")
        ids = _turn(tok, text, add_system=(call == 0))
        a = greedy.generate(0, frame, ids, step_id=step)
        b = spec.generate(0, frame, ids, step_id=step)
        assert a == b, f"call {call}: {a} != {b}"
        assert greedy.envs[0].kv_length == spec.envs[0].kv_length

    # streaming chunk parity
    a = greedy.continue_decode(0)
    b = spec.continue_decode(0)
    assert a == b
    assert greedy.envs[0].kv_length == spec.envs[0].kv_length

    # window boundary with memory
    greedy.reset_for_env(0)
    spec.reset_for_env(0)
    step = nf
    frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
    hist_steps = list(range(0, nf, nf // nh))
    text = chatml.observation_prompt(
        None, "walk to the window These are your historical "
        "observations <memory>.")
    ids = _turn(tok, text, add_system=True)
    a = greedy.generate(0, frame, ids, step_id=step,
                        history_steps=hist_steps)
    b = spec.generate(0, frame, ids, step_id=step,
                      history_steps=hist_steps)
    assert a == b, f"boundary: {a} != {b}"
    assert greedy.envs[0].kv_length == spec.envs[0].kv_length


@pytest.mark.slow
def test_model_call_on_boundary_resets_window(setup):
    """A model call whose step lands exactly on the num_frames boundary
    must perform window-reset bookkeeping (previously only non-model
    steps did; a queue that empties at the boundary silently ran a
    double-length window)."""
    from streamvln_tpu.agent import VLNAgent
    cfg, params, tok = setup
    eng = make_engine(cfg, params, tok, cache_capacity=4096,
                      buckets=(768,))
    agent = VLNAgent(eng, tok)
    agent.reset_memory(0)
    rng = np.random.RandomState(0)
    nf = cfg.num_frames
    for t in range(nf):
        agent.step(0, rng.randint(0, 255, (48, 64, 3)).astype(np.uint8),
                   "go", run_model=True)
    assert agent.step_id[0] == nf
    assert not agent.in_dialogue[0]
    assert eng.envs[0].kv_length == 0
    assert agent.time_ids[0] == []


def test_moe_engine_streaming_parity():
    """Sparse-MoE LLM (Mixtral/Qwen2-MoE wrapper families) through the
    streaming engine: incremental KV-cached decode must match naive
    full recompute. Covers _moe_mlp (router + shared expert) inside
    both the prefill forward and the decode-loop _layer_step — the
    reference serves its MoE wrapper through the same HF generate path
    as the dense models (llava/model/language_model/llava_qwen_moe.py).
    """
    import dataclasses
    base = tiny_streamvln()
    cfg = dataclasses.replace(base, llm=dataclasses.replace(
        base.llm, num_experts=4, num_experts_per_tok=2,
        shared_expert_intermediate_size=32))
    params = streamvln.init(jax.random.PRNGKey(3), cfg)
    tok = ByteTokenizer()
    engine = make_engine(cfg, params, tok)
    naive = NaiveDialogue(cfg, params, tok, max_new=6)
    rng = np.random.RandomState(7)

    for call in range(3):
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        text = chatml.observation_prompt(None, "walk ahead"
                                         if call == 0 else "")
        ids = _turn(tok, text, add_system=(call == 0))
        got = engine.generate(0, frame, ids,
                              step_id=call * cfg.num_future_steps)
        want = naive.generate(frame, ids)
        assert got == want, f"call {call}: {got} != {want}"
