"""Tests for inference pipeline host utilities (parity targets cited in
rvc_tpu/infer/pipeline.py, postprocess.py, utils/split_audio.py)."""

import numpy as np
import pytest

from rvc_tpu.infer.pipeline import (
    AUTOTUNE_REF_FREQS, autotune_f0, change_rms, coarse_f0,
)
from rvc_tpu.infer.postprocess import (
    apply_post_process, bitcrush, clipping, compressor, distortion, gain,
    limiter, reverb,
)
from rvc_tpu.utils.split_audio import merge_audio, process_audio


def test_autotune_snaps_to_reference_freqs():
    f0 = np.array([440.5, 0.0, 221.3], np.float32)
    out = autotune_f0(f0, strength=1.0)
    assert out[0] == pytest.approx(440.0)
    assert out[2] == pytest.approx(220.0)
    # 0 snaps to the lowest ref freq at full strength (reference behavior)
    assert out[1] == pytest.approx(AUTOTUNE_REF_FREQS[0])


def test_autotune_partial_strength():
    f0 = np.array([442.0], np.float32)
    out = autotune_f0(f0, strength=0.5)
    assert out[0] == pytest.approx(441.0)


def test_coarse_f0_range_and_zero():
    f0 = np.array([0.0, 50.0, 500.0, 1100.0, 2000.0], np.float32)
    c = coarse_f0(f0)
    assert c.dtype == np.int32
    assert c[0] == 1          # unvoiced -> 1
    assert 1 <= c[1] <= 255
    assert c[4] == 255        # above range clamps
    assert np.all(np.diff(c[1:4].astype(int)) > 0)  # monotone in f0


def test_change_rms_full_rate_matches_source_level():
    rng = np.random.default_rng(0)
    src = (rng.normal(size=16000) * 0.5).astype(np.float32)
    tgt = (rng.normal(size=16000) * 0.05).astype(np.float32)
    out = change_rms(src, 16000, tgt, 16000, rate=0.0)  # rate 0 -> source env
    assert np.sqrt(np.mean(out**2)) > np.sqrt(np.mean(tgt**2)) * 2
    # rate 1 -> unchanged
    out1 = change_rms(src, 16000, tgt, 16000, rate=1.0)
    np.testing.assert_allclose(out1, tgt, atol=1e-5)


def test_split_and_merge_roundtrip_length():
    sr = 16000
    rng = np.random.default_rng(1)
    voiced = (rng.normal(size=sr) * 0.3).astype(np.float32)
    audio = np.concatenate(
        [np.zeros(sr // 2, np.float32), voiced,
         np.zeros(sr // 2, np.float32), voiced]
    )
    segments, intervals = process_audio(audio, sr)
    assert len(segments) >= 1
    merged = merge_audio(segments, segments, intervals, sr, sr)
    # same-rate identity merge restores the voiced content and roughly the
    # original timeline (trailing silence may be dropped)
    assert abs(len(merged) - len(audio)) < sr


def test_gain_and_clipping():
    x = np.array([0.5, -0.5], np.float32)
    assert gain(x, 16000, 6.02)[0] == pytest.approx(1.0, rel=1e-3)
    assert np.max(np.abs(clipping(x * 10, 16000, -6.0))) == pytest.approx(
        10 ** (-6 / 20), rel=1e-5
    )


def test_distortion_bounded():
    x = np.random.default_rng(2).normal(size=1000).astype(np.float32)
    assert np.max(np.abs(distortion(x, 16000, 25.0))) <= 1.0


def test_bitcrush_quantizes():
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    out = bitcrush(x, 16000, 4)
    assert len(np.unique(out)) <= 2**4 + 1


def test_compressor_reduces_peaks():
    x = np.concatenate([np.full(4000, 0.9), np.full(4000, 0.05)]).astype(np.float32)
    out = compressor(x, 16000, threshold_db=-20, ratio=4.0)
    # after the attack envelope converges (~100 samples at 1 ms), peaks duck
    assert np.abs(out[200:4000]).max() < 0.5


def test_limiter_caps_level():
    x = (np.sin(np.linspace(0, 100, 16000)) * 1.5).astype(np.float32)
    out = limiter(x, 16000, threshold_db=-6.0)
    assert np.abs(out[2000:]).max() <= 10 ** (-6 / 20) * 1.2


def test_reverb_adds_tail():
    sr = 16000
    x = np.zeros(sr, np.float32)
    x[100] = 1.0
    out = reverb(x, sr, room_size=0.8, wet_gain=1.0, dry_gain=0.0)
    assert np.abs(out[sr // 2 :]).max() > 1e-4  # energy half a second later


def test_apply_post_process_chain_runs():
    x = np.random.default_rng(3).normal(size=8000).astype(np.float32) * 0.1
    out = apply_post_process(
        x, 16000, reverb=True, gain=True, gain_db=3.0,
        compressor=True, compressor_ratio=2.0, delay=True,
    )
    assert out.shape == x.shape and np.isfinite(out).all()


def test_log_sigma_converter():
    """EXTRAS/log_sigma_converter.py semantics: s = -0.5 ln(2W)."""
    from rvc_tpu.utils.extras import log_sigma_for_weight, weight_for_log_sigma

    import math

    assert log_sigma_for_weight(0.5) == pytest.approx(0.0)
    for w in (0.1, 1.0, 45.0):
        s = log_sigma_for_weight(w)
        assert weight_for_log_sigma(s) == pytest.approx(w)
        # uncertainty weighting 1/(2 e^{2s}) reproduces W
        assert 1.0 / (2.0 * math.exp(2 * s)) == pytest.approx(w)
    with pytest.raises(ValueError):
        log_sigma_for_weight(0)


def test_download_trigger_server(tmp_path):
    """Stdlib stand-in for the reference flask server: GET /download/<url>
    installs a local model, POST /shutdown stops it."""
    import urllib.request

    from rvc_tpu.utils.http_server import start_download_server

    src = tmp_path / "m.pth.zip"
    import zipfile

    with zipfile.ZipFile(src, "w") as z:
        z.writestr("voice/model.npz", b"x")
    srv = start_download_server(port=18763)
    try:
        url = f"http://127.0.0.1:18763/download/{src}"
        with urllib.request.urlopen(url, timeout=10) as r:
            assert r.status == 200
            assert b"downloaded" in r.read()
        req = urllib.request.Request(
            "http://127.0.0.1:18763/shutdown", method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
    finally:
        srv.shutdown()


def test_resolve_index_path_accepts_directory(tmp_path):
    """--index_path may be a model log dir: the single *index* artifact in
    it is auto-matched (reference tabs/inference get_indexes behavior);
    files and empty dirs pass through unchanged."""
    from rvc_tpu.infer.converter import VoiceConverter

    d = tmp_path / "logs" / "voice"
    d.mkdir(parents=True)
    (d / "voice.index.npz").write_bytes(b"x")
    (d / "G_1.npz").write_bytes(b"x")
    assert VoiceConverter.resolve_index_path(str(d)) == str(d / "voice.index.npz")
    f = str(d / "voice.index.npz")
    assert VoiceConverter.resolve_index_path(f) == f
    e = tmp_path / "empty"
    e.mkdir()
    assert VoiceConverter.resolve_index_path(str(e)) == ""
    assert VoiceConverter.resolve_index_path("") == ""


def test_p_len_truncates_to_embedder_frames():
    """Lengths whose remainder mod 16000 falls in [15840, 16000) get one
    fewer latent frame than t//160 from their bucket (HuBERT VALID stack:
    2*((L-400)//320+1) frames); _p_len must truncate exactly like the
    reference (rvc/infer/pipeline.py:467) instead of claiming a frame the
    embedder never emits."""
    from rvc_tpu.infer.pipeline import Pipeline

    def emb_frames(L):
        ks, ss = (10, 3, 3, 3, 3, 2, 2), (5, 2, 2, 2, 2, 2, 2)
        for k, s in zip(ks, ss):
            L = (L - k) // s + 1
        return 2 * L

    bucket = Pipeline._bucket_len
    for t_real in (15839, 15840, 15900, 15999, 16000, 31850, 63900, 64000):
        t_pad = bucket(None, t_real)
        p = Pipeline._p_len(None, t_real, t_pad)
        assert p <= emb_frames(t_pad), (t_real, p, emb_frames(t_pad))
        assert p == min(t_real // 160, emb_frames(t_pad))
