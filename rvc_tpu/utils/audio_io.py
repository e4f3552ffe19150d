"""Host-side audio I/O.

The reference reads audio with libsndfile + soxr (reference:
rvc/lib/utils.py:37-50). Neither wheel is available here, so WAV I/O is
implemented over scipy.io.wavfile (PCM16/24/32 + float32) and resampling is a
kaiser-windowed polyphase filter (scipy.signal.resample_poly on the host;
rvc_tpu.ops.resample for the on-device path).
"""

from __future__ import annotations

import os
from fractions import Fraction

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in [-1, 1] shaped [T] or [T, C], sr)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, int(sr)


def write_wav(path: str, data: np.ndarray, sr: int, subtype: str = "PCM_16") -> None:
    """Write float32 [-1, 1] samples as WAV (PCM_16, PCM_32, or FLOAT)."""
    data = np.asarray(data)
    if data.ndim > 1 and data.shape[0] < data.shape[-1] and data.ndim == 2:
        # accept [C, T] and transpose to [T, C]
        if data.shape[0] <= 8:
            data = data.T
    if subtype == "PCM_16":
        out = np.clip(data, -1.0, 1.0)
        out = (out * 32767.0).astype(np.int16)
    elif subtype == "PCM_32":
        # scale in float64: float32(1.0 * 2147483647) rounds UP to 2^31 and
        # wraps full-scale peaks to INT32_MIN on the int32 cast
        out = np.clip(data.astype(np.float64), -1.0, 1.0)
        out = (out * 2147483647.0).astype(np.int32)
    elif subtype == "FLOAT":
        out = data.astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV subtype {subtype!r}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sr, out)


def wav_frames(path: str) -> int | None:
    """Frame count of a RIFF WAV from its header alone (no sample decode).

    Walks the chunk list for `fmt ` (block align = bytes per frame across
    channels) and `data` (payload bytes); frames = data_size // block_align.
    Works for any sample format (PCM16/24/32, float32) unlike a raw
    filesize // bytes_per_sample guess. Returns None if the file is not a
    parseable RIFF WAV.
    """
    try:
        with open(path, "rb") as f:
            head = f.read(12)
            if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                return None
            block_align = data_size = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                cid = hdr[:4]
                size = int.from_bytes(hdr[4:8], "little")
                if cid == b"fmt " and size >= 16:
                    fmt = f.read(size + (size & 1))
                    block_align = int.from_bytes(fmt[12:14], "little")
                elif cid == b"data":
                    data_size = size
                    break
                else:
                    f.seek(size + (size & 1), os.SEEK_CUR)
            if not block_align or data_size is None:
                return None
            return data_size // block_align
    except OSError:
        return None


def to_mono(data: np.ndarray) -> np.ndarray:
    if data.ndim == 2:
        return data.mean(axis=-1)
    return data


def resample(data: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """High-quality polyphase resampling (host-side soxr equivalent).

    Prefers the native C++ Kaiser-windowed polyphase engine
    (native/audio_engine.cpp via utils.native); falls back to scipy."""
    if orig_sr == target_sr:
        return data.astype(np.float32)
    if data.ndim == 1:
        from . import native

        out = native.resample(data, orig_sr, target_sr)
        if out is not None:
            return out
    ratio = Fraction(target_sr, orig_sr)
    out = resample_poly(data, ratio.numerator, ratio.denominator, axis=0)
    return out.astype(np.float32)


def _read_via_ffmpeg(path: str) -> tuple[np.ndarray, int] | None:
    """Decode any format through an external ffmpeg when one exists
    (the reference shells out the same way, rvc/lib/utils.py + pydub)."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        return None
    proc = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
         "-ar", "48000", "-"],
        capture_output=True,
    )
    if proc.returncode != 0:
        raise ValueError(f"ffmpeg failed on {path}: {proc.stderr.decode()[:200]}")
    return np.frombuffer(proc.stdout, np.float32).copy(), 48000


def read_audio(path: str) -> tuple[np.ndarray, int]:
    """Read any supported container -> (float32 [T]/[T, C], sr).

    WAV via scipy; FLAC via the native C++ codec (native/flac_codec.cpp);
    mp3/ogg/m4a via external ffmpeg when available.
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:4] == b"RIFF":
        return read_wav(path)
    if magic == b"fLaC":
        from . import native

        out = native.flac_read(path)
        if out is not None:
            return out
    via = _read_via_ffmpeg(path)
    if via is not None:
        return via
    raise ValueError(
        f"cannot decode {path!r}: WAV and FLAC are supported natively; "
        "mp3/ogg/m4a need an ffmpeg binary on PATH"
    )


def load_audio(path: str, target_sr: int | None = None) -> np.ndarray:
    """Load audio as mono float32, optionally resampled.

    Mirrors reference load_audio behavior (rvc/lib/utils.py:37-50):
    read -> flatten to mono -> resample to the requested rate.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"audio file not found: {path}")
    data, sr = read_audio(path)
    data = to_mono(data)
    if target_sr is not None and sr != target_sr:
        data = resample(data, sr, target_sr)
    return data.astype(np.float32)


def save_audio(path: str, data: np.ndarray, sr: int, fmt: str | None = None) -> None:
    """Save mono/stereo audio; format from `fmt` or the extension
    (WAV + FLAC natively; anything else falls back to WAV)."""
    ext = (fmt or os.path.splitext(path)[1].lstrip(".")).lower()
    if ext == "flac":
        from . import native

        try:
            if native.flac_write(path, np.asarray(data), sr):
                return
        except Exception as e:
            # an encoder failure must not lose the audio — fall back to WAV
            print(f"FLAC encode failed ({e}); writing WAV instead")
    write_wav(path, data, sr)
