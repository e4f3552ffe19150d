"""ctypes bindings for the native C++ audio engine.

The reference's host-side hot loops live in C wheels (soxr resampling,
librosa framing). Ours live in native/audio_engine.cpp: Kaiser-windowed
polyphase resampler, frame-RMS scanner, normalization blend. This module
loads the shared library (building it on first use when a toolchain exists)
and exposes numpy-facing wrappers; callers fall back to scipy when the
library is unavailable (see utils/audio_io.py, train/preprocess.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudio_engine.so"))


def _build() -> bool:
    srcs = [os.path.join(_NATIVE_DIR, n)
            for n in ("audio_engine.cpp", "flac_codec.cpp")]
    srcs = [s for s in srcs if os.path.exists(s)]
    if not srcs:
        return False
    # Compile to a temp file and rename over the target: dlopen dedupes by
    # inode, so rebuilding in place would (a) hand back the stale handle on
    # re-CDLL and (b) truncate a possibly-mapped .so (SIGBUS risk). The
    # rename gives the rebuilt library a fresh inode.
    tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, *srcs],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return os.path.exists(_LIB_PATH)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "flac_decode"):
        # stale library from before the FLAC codec existed: rebuild
        if _build():
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None

    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    lib.frame_rms.restype = ctypes.c_int64
    lib.frame_rms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.normalize_blend.restype = ctypes.c_int32
    lib.normalize_blend.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "flac_decode"):
        lib.flac_probe.restype = ctypes.c_int32
        lib.flac_probe.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_decode.restype = ctypes.c_int64
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.flac_encode.restype = ctypes.c_int64
        lib.flac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample(data: np.ndarray, orig_sr: int, target_sr: int) -> Optional[np.ndarray]:
    """Native polyphase resample; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(data, np.float32)
    n_out = lib.resample_poly(_fptr(x), len(x), float(orig_sr),
                              float(target_sr), None)
    out = np.empty(n_out, np.float32)
    lib.resample_poly(_fptr(x), len(x), float(orig_sr), float(target_sr),
                      _fptr(out))
    return out


def frame_rms(data: np.ndarray, frame: int, hop: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(data, np.float32)
    n_frames = (len(x) + 2 * (frame // 2) - frame) // hop + 1
    out = np.empty(n_frames, np.float32)
    written = lib.frame_rms(_fptr(x), len(x), frame, hop, _fptr(out), n_frames)
    return out[:written]


def normalize_blend(
    data: np.ndarray, max_amp: float = 0.9, alpha: float = 0.75
) -> Optional[np.ndarray]:
    """Returns None when lib unavailable; raises ValueError on rejected take."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(data, np.float32)
    out = np.empty_like(x)
    rc = lib.normalize_blend(_fptr(x), len(x), max_amp, alpha, _fptr(out))
    if rc != 0:
        raise ValueError("rejected: peak > 2.5")
    return out


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def flac_read(path: str) -> Optional[tuple]:
    """Decode a FLAC file -> (float32 [T] or [T, C], sample_rate), or None
    when the native library is unavailable. Raises ValueError on a corrupt
    or non-FLAC file."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "flac_decode"):
        return None
    raw = np.frombuffer(open(path, "rb").read(), np.uint8)
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    if lib.flac_probe(_u8ptr(raw), len(raw), ctypes.byref(sr),
                      ctypes.byref(ch), ctypes.byref(bps),
                      ctypes.byref(total)) != 0:
        raise ValueError(f"not a decodable FLAC file: {path}")
    # total_samples can be 0 (unknown); start from a size-based guess and
    # grow — FLAC compresses, so bits/bps alone UNDERestimates the frame
    # count and a fixed cap would silently truncate the tail
    if total.value > 0:
        cap = total.value
    else:
        cap = max(4096, (len(raw) * 8 // max(bps.value, 1)) * 2)
    while True:
        out = np.empty(cap * ch.value, np.float32)
        n = lib.flac_decode(_u8ptr(raw), len(raw), _fptr(out), cap)
        if n < 0:
            raise ValueError(f"FLAC decode failed: {path}")
        if n < cap or total.value > 0:
            break
        cap *= 2  # buffer filled exactly: may be truncated, retry larger
    if total.value > 0 and n < total.value:
        # the decoder bails out of the frame loop on lost sync and returns
        # what it has — STREAMINFO knows the true length, so a short result
        # means mid-stream corruption, not a shorter file
        raise ValueError(
            f"FLAC stream truncated/corrupt: decoded {n} of "
            f"{total.value} samples in {path}")
    data = out[: n * ch.value].reshape(n, ch.value)
    return (data[:, 0] if ch.value == 1 else data), int(sr.value)


def flac_write(path: str, data: np.ndarray, sr: int) -> bool:
    """Encode float32 [-1,1] mono/[T,C] audio as 16-bit FLAC. Returns False
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "flac_encode"):
        return False
    x = np.asarray(data, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    inter = np.ascontiguousarray(x.reshape(-1))
    n = x.shape[0]
    bound = lib.flac_encode(_fptr(inter), n, channels, sr, None, 0)
    if bound <= 0:
        return False  # empty/invalid input: let the caller's WAV fallback run
    buf = np.empty(bound, np.uint8)
    written = lib.flac_encode(_fptr(inter), n, channels, sr, _u8ptr(buf), bound)
    if written < 0:
        raise ValueError("FLAC encode failed")
    with open(path, "wb") as f:
        f.write(buf[:written].tobytes())
    return True
