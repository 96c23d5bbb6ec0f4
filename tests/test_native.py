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


# ---------------------------------------------------------------------------
# Native video decode (libav) + ConversationDataset video-file path
# ---------------------------------------------------------------------------

def _write_test_video(path, n_frames=30, w=64, h=48, fps=10):
    cv2 = pytest.importorskip("cv2")
    wr = cv2.VideoWriter(str(path),
                         cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    for i in range(n_frames):
        img = np.full((h, w, 3), i * 8 % 256, np.uint8)
        img[:, : w // 8] = (255, 0, 0)          # BGR blue stripe
        wr.write(img)
    wr.release()


def test_video_info_and_sampling(tmp_path):
    from streamvln_tpu import native
    if not native.video_available():
        pytest.skip(f"libav unavailable: {native.video_build_error()}")
    p = tmp_path / "clip.mp4"
    _write_test_video(p, n_frames=30)
    w, h, fps, n = native.video_info(str(p))
    assert (w, h, n) == (64, 48, 30)
    assert fps == pytest.approx(10.0, rel=0.1)

    frames = native.video_sample_frames(str(p), frames_upbound=8,
                                        force_sample=True)
    assert frames.shape == (8, 48, 64, 3)
    # stripe written as BGR blue -> RGB blue after decode
    assert frames[0, 0, 0, 2] > 180 and frames[0, 0, 0, 0] < 60
    # brightness ramps across sampled frames (ordering preserved)
    mids = frames[:, 24, 40, 1].astype(int)
    assert mids[-1] > mids[0] + 80

    # explicit indices roundtrip
    picked = native.video_read_frames(str(p), [0, 10, 29])
    assert picked.shape == (3, 48, 64, 3)
    assert int(picked[2, 24, 40, 1]) > int(picked[0, 24, 40, 1])


def test_conversation_dataset_consumes_video_file(tmp_path):
    pytest.importorskip("cv2")
    from streamvln_tpu.configs import tiny_streamvln
    from streamvln_tpu.data.cotrain_datasets import ConversationDataset
    from streamvln_tpu.data.tokenizer import ByteTokenizer

    _write_test_video(tmp_path / "clip.mp4", n_frames=20)
    entry = {"id": 0, "video": "clip.mp4", "conversations": [
        {"from": "human", "value": "What color is the stripe?"},
        {"from": "gpt", "value": "Blue."}]}
    cfg = tiny_streamvln()
    ds = ConversationDataset(ByteTokenizer(), cfg, [entry],
                             str(tmp_path), num_frames_qa=4)
    sample = ds[0]
    S = cfg.vision.image_size
    assert sample["images"].shape == (4, S, S, 3)
    assert sample["images"].dtype == np.float32
    # one <image> sentinel per sampled frame was injected
    assert (sample["input_ids"] == -200).sum() == 4
    assert sample["time_ids"].tolist() == [0, 1, 2, 3]


def test_resize_batch_u8_pil_parity():
    from streamvln_tpu import native
    if not native.available():
        pytest.skip(f"native lib unavailable: {native.build_error()}")
    from PIL import Image
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 255, (3, 48, 64, 3), np.uint8)
    out = native.resize_batch_u8(frames, 32)
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
    pil = np.stack([np.asarray(Image.fromarray(f).resize(
        (32, 32), Image.BICUBIC)) for f in frames])
    # PIL-exact up to 1 LSB (accumulation-order rounding)
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 1
