"""Controller + model worker serve stack tests."""
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.agent import VLNAgent
from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.data.tokenizer import ByteTokenizer
from streamvln_tpu.models import streamvln
from streamvln_tpu.serve.controller import (
    Controller, serve_controller)
from streamvln_tpu.serve.model_worker import ModelWorker, serve_worker
from streamvln_tpu.streaming.engine import StreamingEngine


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def test_controller_registry_and_dispatch():
    ctrl = Controller("shortest_queue")
    ctrl.register_worker("http://w1", True,
                         {"model_names": ["m"], "queue_length": 5})
    ctrl.register_worker("http://w2", True,
                         {"model_names": ["m"], "queue_length": 1})
    ctrl.register_worker("http://w3", True,
                         {"model_names": ["other"], "queue_length": 0})
    assert ctrl.list_models() == ["m", "other"]
    assert ctrl.get_worker_address("m") == "http://w2"
    # queue incremented -> next dispatch may differ; heartbeat resets
    ctrl.heartbeat("http://w2", 0)
    assert ctrl.get_worker_address("m") == "http://w2"
    assert ctrl.get_worker_address("missing") == ""


def test_controller_lottery_respects_models():
    ctrl = Controller("lottery")
    ctrl.register_worker("http://a", True, {"model_names": ["x"]})
    for _ in range(10):
        assert ctrl.get_worker_address("x") == "http://a"


def test_controller_expiry():
    ctrl = Controller()
    ctrl.register_worker("http://old", True, {"model_names": ["m"]})
    ctrl.workers["http://old"].last_heart_beat -= 1000
    ctrl.expire_stale()
    assert not ctrl.workers


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)

    ctrl = Controller()
    ctrl_srv = serve_controller(ctrl, "127.0.0.1", 0)
    threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()
    ctrl_url = f"http://127.0.0.1:{ctrl_srv.server_address[1]}"

    worker = ModelWorker(agent, tok, "streamvln-tiny",
                         worker_addr="http://127.0.0.1:0",
                         controller_addr=ctrl_url)
    w_srv = serve_worker(worker, "127.0.0.1", 0)
    worker.worker_addr = f"http://127.0.0.1:{w_srv.server_address[1]}"
    threading.Thread(target=w_srv.serve_forever, daemon=True).start()
    worker.register()
    yield ctrl_url, worker.worker_addr
    ctrl_srv.shutdown()
    w_srv.shutdown()


def test_end_to_end_dispatch_and_generate(stack):
    ctrl_url, worker_url = stack
    models = _post(ctrl_url + "/list_models", {})["models"]
    assert models == ["streamvln-tiny"]
    addr = _post(ctrl_url + "/get_worker_address",
                 {"model": "streamvln-tiny"})["address"]
    assert addr == worker_url
    out = _post(addr + "/worker_generate",
                {"prompt": "walk to the kitchen"})
    assert out["error_code"] == 0
    assert isinstance(out["text"], str)
    assert isinstance(out["actions"], list)
    status = _post(addr + "/worker_get_status", {})
    assert status["model_names"] == ["streamvln-tiny"]


def test_web_server_proxies_chat(stack):
    from streamvln_tpu.serve.web_server import serve_web
    ctrl_url, worker_url = stack
    web_srv = serve_web(ctrl_url, "127.0.0.1", 0)
    threading.Thread(target=web_srv.serve_forever, daemon=True).start()
    web_url = f"http://127.0.0.1:{web_srv.server_address[1]}"
    try:
        with urllib.request.urlopen(web_url + "/", timeout=10) as r:
            page = r.read().decode()
        assert "StreamVLN chat" in page
        models = _post(web_url + "/api/models", {})["models"]
        assert models == ["streamvln-tiny"]
        out = _post(web_url + "/api/chat",
                    {"model": "streamvln-tiny",
                     "prompt": "walk to the kitchen"})
        assert out["error_code"] == 0
        assert isinstance(out["text"], str)
        missing = _post(web_url + "/api/chat", {"model": "nope",
                                                "prompt": "x"})
        assert missing["error_code"] == 2
        # streaming proxy: \0-delimited chunks pass through
        req = urllib.request.Request(
            web_url + "/api/chat_stream",
            data=json.dumps({"model": "streamvln-tiny",
                             "prompt": "walk on"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            parts = [p for p in r.read().split(b"\0") if p]
        assert parts and all(
            json.loads(p)["error_code"] == 0 for p in parts)
    finally:
        web_srv.shutdown()


def test_batched_worker_waves():
    from streamvln_tpu.serve.batch_worker import (
        BatchedWorker, serve_batch_worker)
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(1), cfg)
    tok = ByteTokenizer()
    engine = StreamingEngine(
        params, cfg, n_envs=4, stop_ids=(tok.im_end_id,),
        compute_dtype=jnp.float32, max_new_tokens=4,
        cache_capacity=2048, buckets=(512, 768, 1024))
    agent = VLNAgent(engine, tok)
    worker = BatchedWorker(agent, tok, "streamvln-tiny-batched",
                           max_wait_ms=200.0)
    srv = serve_batch_worker(worker, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        status = _post(url + "/worker_get_status", {})
        assert status["model_names"] == ["streamvln-tiny-batched"]
        # concurrent requests coalesce into one engine wave
        results = [None] * 3

        def call(i):
            results[i] = _post(url + "/worker_generate",
                               {"prompt": f"instruction {i}"})

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for r in results:
            assert r is not None and r["error_code"] == 0
            assert isinstance(r["text"], str)
        assert max(r["batch_size"] for r in results) >= 2
    finally:
        srv.shutdown()
        worker.stop()


def test_cli_single_turn(tmp_path, capsys, monkeypatch):
    from streamvln_tpu.serve import cli
    # tiny model single-turn mode: one JSON line with text + actions
    cli.main(["--model_size", "tiny",
              "--instruction", "walk to the door"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert "actions" in rec and isinstance(rec["actions"], list)
    assert "generate_s" in rec


def test_cli_interactive_reset_and_exit(capsys, monkeypatch):
    import io
    from streamvln_tpu.serve import cli
    monkeypatch.setattr("sys.stdin",
                        io.StringIO("go forward\nreset\nexit\n"))
    cli.main(["--model_size", "tiny"])
    out = capsys.readouterr().out
    assert "(dialogue reset)" in out
    assert '"actions"' in out


def test_worker_generate_stream_chunks():
    """Token-streaming serving (reference:
    llava/serve/model_worker.py:126-180 generate_stream): >= 2 chunks
    must arrive before completion, each carrying the cumulative text,
    over both the generator API and the \\0-delimited HTTP route."""
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    # no stop ids + 2-token decode budget per dispatch -> the 6-token
    # request deterministically streams as 3 chunks
    engine = StreamingEngine(
        params, cfg, stop_ids=(), compute_dtype=jnp.float32,
        max_new_tokens=2, cache_capacity=2048, buckets=(512, 768))
    agent = VLNAgent(engine, tok)
    worker = ModelWorker(agent, tok, "stream-tiny")

    chunks = list(worker.generate_stream("go forward",
                                         max_new_tokens=6))
    assert len(chunks) >= 2
    texts = [c["text"] for c in chunks]
    assert all(c["error_code"] == 0 for c in chunks)
    # cumulative protocol: each chunk's text extends the previous
    # (random tiny-vocab ids can decode to '', so growth need not be
    # strict per chunk)
    for a, b in zip(texts, texts[1:]):
        assert b.startswith(a), (a, b)

    srv = serve_worker(worker, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/worker_generate_stream",
            data=json.dumps({"prompt": "go forward",
                             "max_new_tokens": 6}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            # first chunk must be parseable before the response closes
            buf = b""
            first = None
            while b"\0" not in buf:
                piece = r.read(1)
                assert piece, "stream closed before first chunk"
                buf += piece
            first = json.loads(buf.split(b"\0")[0])
            assert first["error_code"] == 0
            rest = r.read()
        parts = [p for p in (buf + rest).split(b"\0") if p]
        assert len(parts) >= 2
        wire_texts = [json.loads(p)["text"] for p in parts]
        assert wire_texts == texts[:len(wire_texts)] or \
            len(wire_texts) >= 2   # same protocol, fresh dialogue
    finally:
        srv.shutdown()
