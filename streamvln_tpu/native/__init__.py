"""ctypes bindings for the C++ host runtime (build-on-first-use).

`available()` gates callers; every entry point has a pure-Python
fallback elsewhere (ops/preprocess, PIL loaders), so missing toolchains
degrade gracefully.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cpp")
_LIB_PATH = os.path.join(_HERE, "libstreamvln_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB_PATH, "-ljpeg",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.svt_preprocess_batch.restype = ctypes.c_int
        lib.svt_preprocess_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float,
            ctypes.c_float]
        lib.svt_load_preprocess_jpegs.restype = ctypes.c_int
        lib.svt_load_preprocess_jpegs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float,
            ctypes.c_float]
        lib.svt_jpeg_dims.restype = ctypes.c_int
        lib.svt_jpeg_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.svt_decode_jpeg.restype = ctypes.c_int
        lib.svt_decode_jpeg.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int]
        lib.svt_resize_batch_u8.restype = ctypes.c_int
        lib.svt_resize_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def preprocess_batch(frames_u8: np.ndarray, size: int = 384,
                     mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [N, size, size, 3] float32 (threaded C++)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_build_error}")
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    n, h, w, c = frames_u8.shape
    assert c == 3
    out = np.empty((n, size, size, 3), np.float32)
    rc = lib.svt_preprocess_batch(
        frames_u8.ctypes.data_as(ctypes.c_void_p), n, h, w,
        out.ctypes.data_as(ctypes.c_void_p), size, mean, std)
    if rc != 0:
        raise RuntimeError(f"preprocess_batch failed on {rc} frames")
    return out


def resize_batch_u8(frames_u8: np.ndarray,
                    size: int = 384) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [N, size, size, 3] uint8 (PIL-exact
    threaded bicubic; the light half of preprocessing — ship compact
    uint8 to the device, which applies only the normalize affine)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_build_error}")
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    n, h, w, c = frames_u8.shape
    assert c == 3
    out = np.empty((n, size, size, 3), np.uint8)
    rc = lib.svt_resize_batch_u8(
        frames_u8.ctypes.data_as(ctypes.c_void_p), n, h, w,
        out.ctypes.data_as(ctypes.c_void_p), size)
    if rc != 0:
        raise RuntimeError("resize_batch_u8 failed")
    return out


def load_preprocess_jpegs(paths: List[str], size: int = 384,
                          mean: float = 0.5,
                          std: float = 0.5) -> np.ndarray:
    """Read+decode+preprocess JPEG files into [N, size, size, 3] f32."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_build_error}")
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    out = np.empty((len(paths), size, size, 3), np.float32)
    rc = lib.svt_load_preprocess_jpegs(
        arr, len(paths), out.ctypes.data_as(ctypes.c_void_p), size,
        mean, std)
    if rc != 0:
        raise RuntimeError(f"{rc}/{len(paths)} jpegs failed to load")
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_build_error}")
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = np.frombuffer(data, np.uint8)
    if lib.svt_jpeg_dims(buf.ctypes.data_as(ctypes.c_void_p),
                         len(data), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        raise ValueError("not a valid JPEG")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.svt_decode_jpeg(buf.ctypes.data_as(ctypes.c_void_p),
                             len(data),
                             out.ctypes.data_as(ctypes.c_void_p),
                             w.value, h.value)
    if rc != 0:
        raise ValueError(f"decode failed ({rc})")
    return out


# ---------------------------------------------------------------------------
# Video decode (separate shared object; needs system libav* dev files)
# ---------------------------------------------------------------------------

_VIDEO_SRC = os.path.join(_HERE, "video.cpp")
_VIDEO_LIB_PATH = os.path.join(_HERE, "libstreamvln_video.so")
_video_lib: Optional[ctypes.CDLL] = None
_video_error: Optional[str] = None


def _build_video() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _VIDEO_SRC,
        "-o", _VIDEO_LIB_PATH, "-lavformat", "-lavcodec", "-lavutil",
        "-lswscale",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load_video() -> Optional[ctypes.CDLL]:
    global _video_lib, _video_error
    with _lock:
        if _video_lib is not None or _video_error is not None:
            return _video_lib
        if not os.path.exists(_VIDEO_LIB_PATH) or (
                os.path.getmtime(_VIDEO_LIB_PATH)
                < os.path.getmtime(_VIDEO_SRC)):
            _video_error = _build_video()
            if _video_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_VIDEO_LIB_PATH)
        except OSError as e:
            _video_error = str(e)
            return None
        lib.svt_video_info.restype = ctypes.c_int
        lib.svt_video_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64)]
        lib.svt_video_read_frames.restype = ctypes.c_int
        lib.svt_video_read_frames.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _video_lib = lib
        return _video_lib


def video_available() -> bool:
    return _load_video() is not None


def video_build_error() -> Optional[str]:
    _load_video()
    return _video_error


def video_info(path: str):
    """(width, height, fps, n_frames) for a video file."""
    lib = _load_video()
    if lib is None:
        raise RuntimeError(f"video lib unavailable: {_video_error}")
    w, h = ctypes.c_int(), ctypes.c_int()
    fps, n = ctypes.c_double(), ctypes.c_int64()
    rc = lib.svt_video_info(path.encode(), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(fps),
                            ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"cannot probe video {path} (rc={rc})")
    return w.value, h.value, fps.value, n.value


def video_read_frames(path: str, indices) -> np.ndarray:
    """Decode the frames at ascending `indices` -> [n, H, W, 3] u8."""
    lib = _load_video()
    if lib is None:
        raise RuntimeError(f"video lib unavailable: {_video_error}")
    w, h, _, total = video_info(path)
    idx = np.asarray(sorted(set(int(i) for i in indices)), np.int64)
    assert (idx >= 0).all() and (idx < total).all(), (idx, total)
    out = np.empty((len(idx), h, w, 3), np.uint8)
    got = lib.svt_video_read_frames(
        path.encode(), idx.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        len(idx), out.ctypes.data_as(ctypes.c_void_p), w, h)
    if got != len(idx):
        raise ValueError(
            f"decoded {got}/{len(idx)} frames from {path}")
    return out


def video_sample_frames(path: str, video_fps: float = 1.0,
                        frames_upbound: int = 0,
                        force_sample: bool = False) -> np.ndarray:
    """Sample frames the way the reference does (decord path,
    reference: llava/utils.py:32-55): one frame per 1/video_fps
    seconds; if frames_upbound > 0 and exceeded (or force_sample),
    switch to linspace(0, total-1, frames_upbound)."""
    _, _, fps, total = video_info(path)
    stride = max(int(round((fps if fps > 0 else 30.0) / video_fps)), 1)
    idx = list(range(0, total, stride))
    if frames_upbound > 0 and (len(idx) > frames_upbound
                               or force_sample):
        idx = np.linspace(0, total - 1, frames_upbound,
                          dtype=np.int64).tolist()
    return video_read_frames(path, idx)
