"""Native C++ audio engine tests (native/audio_engine.cpp via ctypes).

The engine replaces the reference's soxr/librosa C hot loops; these tests
check numerical quality against scipy and the pure-numpy implementations."""

import numpy as np
import pytest

from rvc_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built (no toolchain)"
)


def test_resample_tone_preserves_frequency():
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = native.resample(x, sr1, sr2)
    assert len(y) == sr2
    win = np.hanning(12000)
    Y = np.abs(np.fft.rfft(y[2000:14000] * win))
    freqs = np.fft.rfftfreq(12000, 1 / sr2)
    assert freqs[np.argmax(Y)] == pytest.approx(1000.0, abs=2.0)
    # stopband: alias-free
    assert 20 * np.log10(Y.max() / max(np.median(Y), 1e-12)) > 80


def test_resample_matches_scipy_closely():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(0)
    x = rng.normal(size=48000).astype(np.float32) * 0.3
    # band-limit so both methods see representable content
    from scipy.signal import butter, filtfilt

    b, a = butter(8, 6000, fs=48000)
    x = filtfilt(b, a, x).astype(np.float32)
    y_native = native.resample(x, 48000, 16000)
    y_scipy = resample_poly(x, 1, 3).astype(np.float32)
    n = min(len(y_native), len(y_scipy)) - 100
    err = np.sqrt(np.mean((y_native[50:n] - y_scipy[50:n]) ** 2))
    sig = np.sqrt(np.mean(y_scipy[50:n] ** 2))
    assert err / sig < 0.05


def test_resample_upsampling():
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample(x, 16000, 48000)
    assert len(y) == 48000
    Y = np.abs(np.fft.rfft(y[4000:44000] * np.hanning(40000)))
    freqs = np.fft.rfftfreq(40000, 1 / 48000)
    assert freqs[np.argmax(Y)] == pytest.approx(440.0, abs=2.0)


def test_frame_rms_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=5000).astype(np.float32)
    frame, hop = 240, 120
    got = native.frame_rms(x, frame, hop)
    pad = frame // 2
    y = np.pad(x, (pad, pad))
    n = (len(y) - frame) // hop + 1
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    ref = np.sqrt(np.mean(y[idx] ** 2, axis=1))
    np.testing.assert_allclose(got[: len(ref)], ref, rtol=1e-4, atol=1e-5)


def test_normalize_blend_semantics():
    x = (np.sin(np.linspace(0, 30, 4000)) * 0.5).astype(np.float32)
    out = native.normalize_blend(x, 0.9, 0.75)
    peak = np.abs(x).max()
    ref = x / peak * (0.9 * 0.75) + 0.25 * x
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_normalize_blend_rejects_clipped():
    x = np.full(100, 3.0, np.float32)
    with pytest.raises(ValueError):
        native.normalize_blend(x)
