"""Remote dataset IO (reference: petrel_client paths,
mmc4_dataset.py:26-29,726-735,818-819) and the serving moderation hook
(reference: llava/utils.py:182-203 + gradio_web_server --moderate)."""
import io
import json
import os

import numpy as np
import pytest

from streamvln_tpu.data import remote


def test_local_and_file_scheme(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert remote.read_bytes(str(p)) == b"hello"
    assert remote.read_bytes("file://" + str(p)) == b"hello"
    assert not remote.is_remote(str(p))
    assert remote.is_remote("s3://bucket/key")
    assert remote.is_remote("https://host/x.json")


def test_custom_scheme_registry(tmp_path):
    blobs = {"myfs://a/b.json": json.dumps([{"id": 1}]).encode()}
    remote.register_scheme("myfs", lambda uri: blobs[uri])
    try:
        assert json.loads(remote.read_bytes("myfs://a/b.json")) == \
            [{"id": 1}]
    finally:
        remote._OPENERS.pop("myfs", None)


def test_s3_gated_like_reference():
    try:
        import boto3  # noqa: F401
        pytest.skip("boto3 present; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="boto3"):
        remote.read_bytes("s3://bucket/key")


def test_mixture_loader_reads_remote_shard(tmp_path):
    """load_mixture_entries pulls a json shard through the URI opener
    (the reference reads shards via the petrel client the same way)."""
    from streamvln_tpu.data.cotrain_datasets import load_mixture_entries
    entries = [{"id": i, "conversations": []} for i in range(3)]
    blobs = {"myfs://shards/q.json": json.dumps(entries).encode()}
    remote.register_scheme("myfs", lambda uri: blobs[uri])
    try:
        yml = tmp_path / "mix.yaml"
        yml.write_text("QA_datasets:\n"
                       "  - json_path: myfs://shards/q.json\n"
                       "    sampling_strategy: all\n")
        got = load_mixture_entries(str(yml), "QA_datasets")
        assert len(got) == 3
    finally:
        remote._OPENERS.pop("myfs", None)


def test_open_image_remote(tmp_path):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, "PNG")
    blobs = {"myfs://img/x.png": buf.getvalue()}
    remote.register_scheme("myfs", lambda uri: blobs[uri])
    try:
        img = remote.open_image("myfs://img/x.png")
        assert img.size == (8, 8) and img.mode == "RGB"
    finally:
        remote._OPENERS.pop("myfs", None)


# ---------------------------------------------------------------------------
# moderation
# ---------------------------------------------------------------------------

def test_moderation_fail_open_without_key(monkeypatch):
    from streamvln_tpu.serve import moderation
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert moderation.violates_moderation("anything") is False


def test_moderation_pluggable():
    from streamvln_tpu.serve import moderation
    moderation.set_moderator(lambda t: "bad" in t)
    try:
        assert moderation.violates_moderation("a bad prompt") is True
        assert moderation.violates_moderation("a fine prompt") is False
    finally:
        moderation.set_moderator(None)


def test_web_server_moderation_gate(tmp_path):
    """--moderate gates /api/chat with error_code 3 (reference UI shows
    the moderation message and drops the request)."""
    import threading
    import urllib.request

    from streamvln_tpu.serve import moderation
    from streamvln_tpu.serve.web_server import serve_web
    moderation.set_moderator(lambda t: True)
    srv = serve_web("http://localhost:1", host="127.0.0.1", port=0,
                    moderate=True)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/chat",
            data=json.dumps({"model": "m", "prompt": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        assert out["error_code"] == 3
    finally:
        moderation.set_moderator(None)
        srv.shutdown()
        srv.server_close()
