"""Temperature / top-p sampling in the streaming decode path.

Reference surface: the serving stack samples with temperature/top_p
(llava/serve/model_worker.py:143-167 — HF `generate(do_sample=...)`
gated at temperature 0.001, TopPLogitsWarper nucleus cut). The engine's
`_sample_loop` must (a) reduce to exact greedy at temp<=1e-3 or
top_p->0, (b) be deterministic given the engine's sample_seed, and
(c) match HF's TopPLogitsWarper kept-set semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data import chatml
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.streaming.engine import StreamingEngine, _sample_tok


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
    kw.setdefault("n_envs", 1)
    return StreamingEngine(params, cfg, stop_ids=(tok.im_end_id,), **kw)


def _turn(tok, text, add_system=True):
    ids, _ = chatml.tokenize_dialogue(tok, [("user", text)],
                                      add_system=add_system,
                                      with_labels=False)
    return np.concatenate([ids, np.asarray(chatml.generation_prompt(tok),
                                           np.int32)])


def _frame(seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, (48, 64, 3), np.uint8)


def test_temp_below_gate_is_exact_greedy(setup):
    """temperature <= 1e-3 must take the plain greedy path (HF
    do_sample gate) and match a no-arg greedy call token-for-token."""
    cfg, params, tok = setup
    ids = _turn(tok, chatml.observation_prompt(None, "go forward"))

    greedy = make_engine(cfg, params, tok).generate(
        0, _frame(), ids, step_id=0)
    gated = make_engine(cfg, params, tok).generate(
        0, _frame(), ids, step_id=0, temperature=1e-4, top_p=0.9)
    assert gated == greedy


def test_topp_zero_equals_greedy(setup):
    """top_p -> 0 keeps only the best token: sampling at any
    temperature must equal greedy decode exactly."""
    cfg, params, tok = setup
    ids = _turn(tok, chatml.observation_prompt(None, "turn left"))

    greedy = make_engine(cfg, params, tok).generate(
        0, _frame(1), ids, step_id=0)
    nucleus1 = make_engine(cfg, params, tok).generate(
        0, _frame(1), ids, step_id=0, temperature=1.0, top_p=0.0)
    assert nucleus1 == greedy


def test_sampling_deterministic_by_seed(setup):
    """Same sample_seed + same call order -> identical tokens; across
    several seeds at high temperature at least one draw differs."""
    cfg, params, tok = setup
    ids = _turn(tok, chatml.observation_prompt(None, "explore"))

    def run(seed):
        eng = make_engine(cfg, params, tok)
        eng.sample_seed = seed
        return eng.generate(0, _frame(2), ids, step_id=0,
                            temperature=3.0, top_p=1.0)

    a, b = run(7), run(7)
    assert a == b
    others = [run(s) for s in (0, 1, 2)]
    assert any(o != a for o in others), \
        "high-temp sampling produced identical tokens across 4 seeds"
    vocab = cfg.llm.vocab_size
    assert all(0 <= t < vocab for t in a)


def test_per_env_dict_rows_mix_greedy_and_sampled(setup):
    """Coalesced batch where env0 requests temp 0 and env1 temp 3:
    env0's row must equal a pure-greedy run exactly (the batched
    worker's per-request sampling contract)."""
    cfg, params, tok = setup
    ids = _turn(tok, chatml.observation_prompt(None, "go to the door"))

    greedy_eng = make_engine(cfg, params, tok, n_envs=2)
    g = greedy_eng.generate_batch(
        [(0, _frame(3), ids, 0, ()), (1, _frame(4), ids, 0, ())])

    mixed_eng = make_engine(cfg, params, tok, n_envs=2)
    m = mixed_eng.generate_batch(
        [(0, _frame(3), ids, 0, ()), (1, _frame(4), ids, 0, ())],
        temperature={0: 0.0, 1: 3.0}, top_p={1: 1.0})
    assert m[0] == g[0]
    vocab = cfg.llm.vocab_size
    assert all(0 <= t < vocab for t in m[1])


def test_continue_decode_sampling(setup):
    """generate + continue_decode chain with sampling stays
    deterministic under a fixed seed and emits in-vocab tokens."""
    cfg, params, tok = setup

    def run(seed):
        eng = make_engine(cfg, params, tok, max_new_tokens=2,
                          buckets=(512, 768))
        eng.stop_ids = ()   # keep decoding past im_end
        eng.sample_seed = seed
        ids = _turn(tok, chatml.observation_prompt(None, "go on"))
        toks = list(eng.generate(0, _frame(5), ids, step_id=0,
                                 temperature=2.0, top_p=0.95))
        toks += eng.continue_decode(0, temperature=2.0, top_p=0.95)
        toks += eng.continue_decode(0, temperature=2.0, top_p=0.95)
        return toks

    a, b = run(11), run(11)
    assert a == b
    assert len(a) >= 4
    vocab = cfg.llm.vocab_size
    assert all(0 <= t < vocab for t in a)


def test_sample_tok_matches_hf_top_p_warper():
    """_sample_tok's nucleus kept-set must match transformers'
    TopPLogitsWarper on random logits (tie-free)."""
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 64).astype(np.float32) * 3.0
    for top_p in (0.1, 0.5, 0.9, 0.999):
        warper = TopPLogitsWarper(top_p=top_p)
        ref = warper(None, torch.tensor(logits)).numpy()
        ref_kept = ref > -1e30

        temp = jnp.ones((4,), jnp.float32)
        tp = jnp.full((4,), top_p, jnp.float32)
        lg = jnp.asarray(logits)
        sl = jnp.sort(lg / temp[:, None], axis=-1)[:, ::-1]
        pr = jax.nn.softmax(sl.astype(jnp.float32), axis=-1)
        before = jnp.cumsum(pr, axis=-1) - pr
        kth = jnp.maximum(
            jnp.sum(before <= tp[:, None], axis=-1) - 1, 0)
        thresh = jnp.take_along_axis(sl, kth[:, None], axis=-1)
        ours_kept = np.asarray(lg >= thresh)
        np.testing.assert_array_equal(ours_kept, ref_kept,
                                      err_msg=f"top_p={top_p}")

    # and the sampler draws only from the kept set
    key = jax.random.PRNGKey(0)
    toks = _sample_tok(jnp.asarray(logits),
                       jnp.ones((4,), jnp.float32),
                       jnp.full((4,), 0.5, jnp.float32), key)
    warper = TopPLogitsWarper(top_p=0.5)
    kept = (warper(None, torch.tensor(logits)).numpy() > -1e30)
    for row, t in enumerate(np.asarray(toks)):
        assert kept[row, int(t)]


def test_worker_generate_with_sampling(setup):
    """Serving surface: temperature/top_p ride through ModelWorker
    generate and generate_stream (reference request params,
    llava/serve/model_worker.py:143-167)."""
    from streamvln_tpu.serve.model_worker import ModelWorker
    cfg, params, tok = setup
    eng = make_engine(cfg, params, tok, buckets=(512, 768, 1024))
    worker = ModelWorker(VLNAgent(eng, tok), tok, "tiny-sample")

    out = worker.generate("walk ahead", temperature=2.0, top_p=0.9)
    assert out["error_code"] == 0
    assert isinstance(out["text"], str)

    chunks = list(worker.generate_stream(
        "walk ahead", max_new_tokens=6, temperature=2.0, top_p=0.9))
    assert chunks and all(c["error_code"] == 0 for c in chunks)
