"""Regression tests for the round-2h infer/embedders review findings."""

import os

import numpy as np
import pytest


def test_parse_f0_methods():
    from rvc_tpu.predictors.f0_extractor import parse_f0_methods

    assert parse_f0_methods("rmvpe") == ["rmvpe"]
    assert parse_f0_methods("hybrid[crepe+rmvpe]") == ["crepe", "rmvpe"]
    assert parse_f0_methods("hybrid[ rmvpe + fcpe ]") == ["rmvpe", "fcpe"]


def test_bucket_len_is_ceiling():
    from rvc_tpu.infer.pipeline import SAMPLE_RATE, Pipeline

    b = Pipeline._bucket_len
    assert b(None, SAMPLE_RATE) == SAMPLE_RATE          # exact multiple: no pad
    assert b(None, SAMPLE_RATE + 1) == 2 * SAMPLE_RATE  # else: next bucket
    assert b(None, 1) == SAMPLE_RATE


def test_delayed_recursion_matches_dense_lfilter():
    from scipy import signal as sps

    from rvc_tpu.infer.postprocess import _delayed_recursion

    rng = np.random.default_rng(0)
    x = rng.normal(size=3000)
    for d, (b0, b1, a1) in [(7, (0.0, 1.0, 0.67)), (113, (-0.5, 1.0, 0.5)),
                            (1, (0.0, 1.0, 0.3))]:
        b = np.zeros(d + 1)
        b[0], b[d] = b0, b1
        a = np.zeros(d + 1)
        a[0], a[d] = 1.0, -a1
        np.testing.assert_allclose(
            _delayed_recursion(x, d, b0, b1, a1), sps.lfilter(b, a, x),
            atol=1e-10)


def test_reverb_runs_fast_on_long_audio():
    import time

    from rvc_tpu.infer.postprocess import reverb

    x = (np.random.default_rng(1).normal(size=48000 * 10) * 0.1).astype(
        np.float32)
    t0 = time.time()
    y = reverb(x, 48000)
    assert time.time() - t0 < 5.0  # was minutes with dense (d+1)-tap filters
    assert np.isfinite(y).all() and y.shape == x.shape


def test_resolve_embedder_path_warns_on_missing_custom(capsys):
    from rvc_tpu.embedders.hubert import resolve_embedder_path

    resolve_embedder_path("contentvec", "/nonexistent/custom.pt")
    out = capsys.readouterr().out
    assert "custom embedder not found" in out


def test_convert_audio_rejects_empty_file(tmp_path):
    from rvc_tpu.infer.converter import VoiceConverter
    from rvc_tpu.utils.audio_io import write_wav

    wp = str(tmp_path / "empty.wav")
    write_wav(wp, np.zeros(0, np.float32), 16000, subtype="FLOAT")
    vc = VoiceConverter(precision="fp32")
    with pytest.raises(ValueError, match="empty audio"):
        # fails before any model load is attempted
        vc.convert_audio(wp, str(tmp_path / "out.wav"),
                         model_path=str(tmp_path / "missing.npz"))


def test_normalize_sr_in_get_vc_meta():
    from rvc_tpu.utils.blender_gui import normalize_sr

    assert normalize_sr("40k") == 40000
    assert normalize_sr(48000) == 48000
    assert normalize_sr(None) is None


# -- native FLAC codec hardening (round-2h native review) --------------------


def _native_lib():
    from rvc_tpu.utils import native

    return native.get_lib()


@pytest.mark.skipif(_native_lib() is None, reason="native lib unavailable")
def test_flac_encode_worst_case_content(tmp_path):
    """Full-scale Nyquist content exceeds 3 bytes/sample under rice k<=14;
    the corrected 4-byte bound must make it encode+roundtrip."""
    from rvc_tpu.utils import native

    p = str(tmp_path / "nyq.flac")
    x = np.tile(np.float32([1.0, -1.0]), 40960)
    assert native.flac_write(p, x, 16000)
    data, sr = native.flac_read(p)
    assert sr == 16000 and len(data) == len(x)
    np.testing.assert_allclose(data, np.clip(x, -1, 1), atol=2e-4)


@pytest.mark.skipif(_native_lib() is None, reason="native lib unavailable")
def test_flac_empty_input_falls_back_to_wav(tmp_path):
    from rvc_tpu.utils.audio_io import save_audio

    p = str(tmp_path / "empty.flac")
    save_audio(p, np.zeros(0, np.float32), 16000)  # must not raise
    assert os.path.exists(p)


@pytest.mark.skipif(_native_lib() is None, reason="native lib unavailable")
def test_flac_truncated_metadata_rejected(tmp_path):
    """A STREAMINFO header whose claimed length exceeds the buffer must be
    rejected (was a heap OOB read), not parsed."""
    from rvc_tpu.utils import native

    p = str(tmp_path / "trunc.flac")
    with open(p, "wb") as f:
        f.write(b"fLaC" + bytes([0x00, 0, 0, 34]) + b"\x00" * 4)
    with pytest.raises(ValueError):
        native.flac_read(p)


@pytest.mark.skipif(_native_lib() is None, reason="native lib unavailable")
def test_flac_midstream_corruption_detected(tmp_path):
    from rvc_tpu.utils import native

    p = str(tmp_path / "good.flac")
    sig = (0.3 * np.sin(2 * np.pi * 220 * np.arange(20000) / 16000)).astype(
        np.float32)
    assert native.flac_write(p, sig, 16000)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # lose frame sync mid-stream
    p2 = str(tmp_path / "corrupt.flac")
    open(p2, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="truncated|corrupt"):
        native.flac_read(p2)


def test_v1_embedder_final_proj_dim():
    """The v1 wiring: HubertConfig(final_proj_dim=256) must emit 256-dim
    features (converter.get_vc selects this when enc_p expects 256)."""
    import jax
    import numpy as np

    from rvc_tpu.embedders import FlaxHubert, HubertConfig

    cfg = HubertConfig(hidden_size=64, num_layers=1, num_heads=2,
                       intermediate_size=128, final_proj_dim=256)
    m = FlaxHubert(cfg)
    x = np.zeros((1, 16000), np.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape[-1] == 256
