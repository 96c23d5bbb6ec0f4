"""C++ host runtime: build, JPEG decode, PIL-parity preprocessing."""
import io
import os

import numpy as np
import pytest

from streamvln_tpu import native
from streamvln_tpu.ops.preprocess import preprocess_frames_host

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native build unavailable: {native.build_error()}")


def test_decode_jpeg_roundtrip():
    from PIL import Image
    # smooth gradient (noise JPEG-compresses with huge error)
    y, x = np.mgrid[0:60, 0:80]
    img = np.stack([x * 3 % 256, y * 4 % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    decoded = native.decode_jpeg(buf.getvalue())
    assert decoded.shape == (60, 80, 3)
    pil_decoded = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    # our libjpeg decode should match PIL's decode of the same bytes
    assert np.abs(decoded.astype(int)
                  - pil_decoded.astype(int)).max() <= 1


def test_decode_garbage_raises():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"definitely not a jpeg")


def test_preprocess_matches_pil_reference():
    """C++ fused bicubic+normalize vs the PIL host path. PIL's uint8
    fixed-point intermediates differ from our float pipeline by up to a
    couple of 8-bit steps per pixel."""
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (3, 120, 160, 3), np.uint8)
    ours = native.preprocess_batch(frames, size=64)
    ref = preprocess_frames_host(frames, size=64)
    assert ours.shape == ref.shape == (3, 64, 64, 3)
    diff = np.abs(ours - ref)
    assert diff.mean() < 0.01       # ~1 8-bit step on average
    assert diff.max() < 0.08        # worst-case few steps at edges


def test_load_preprocess_jpegs(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(2)
    paths = []
    for i in range(4):
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    out = native.load_preprocess_jpegs(paths, size=32)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()
    assert -1.01 <= out.min() and out.max() <= 1.01


def test_load_missing_file_reports():
    with pytest.raises(RuntimeError, match="failed"):
        native.load_preprocess_jpegs(["/nonexistent/x.jpg"], size=32)


def test_upscale_path():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 255, (1, 16, 16, 3), np.uint8)
    ours = native.preprocess_batch(frames, size=64)
    ref = preprocess_frames_host(frames, size=64)
    assert np.abs(ours - ref).max() < 0.08
