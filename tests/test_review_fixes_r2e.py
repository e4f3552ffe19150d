"""Regression tests for the round-2 review pass over parallel/embedders/
configs/utils/cli (findings: dead --hop_length, wrong exported config
segment value, safetensors loader crash, pretrained path mismatch)."""

import json
import os

import numpy as np
import pytest


def test_get_f0_threads_hop_length_to_crepe():
    """--hop_length must reach the crepe predictor and the contour must be
    interpolated back to p_len (reference pipeline.py:242-259)."""
    from rvc_tpu.infer.pipeline import Pipeline

    pipe = Pipeline.__new__(Pipeline)  # get_f0 needs no device state
    seen = {}

    def fake_crepe(audio, hop_length=160):
        seen["hop"] = hop_length
        n = len(audio) // hop_length + 1
        return np.full(n, 220.0, np.float32)

    audio = np.zeros(16000, np.float32)
    p_len = len(audio) // 160
    pitch, pitchf = Pipeline.get_f0(
        pipe, audio, p_len, 0, "crepe", {"crepe": fake_crepe},
        filter_radius=0, hop_length=64)
    assert seen["hop"] == 64
    assert len(pitchf) == p_len
    assert np.allclose(pitchf[10:-10], 220.0, atol=1.0)


def test_config_list_segment_value_per_sr():
    """config[1] is segment_size // hop_length — 40/32/36 for 32/40/48k
    (reference extract_model.py:61-80), not a hardcoded 32."""
    from rvc_tpu.configs import get_config
    from rvc_tpu.utils.export_torch import _config_list

    expected = {32000: 40, 40000: 32, 48000: 36}
    for sr, want in expected.items():
        cfg = get_config(sr)
        got = _config_list(cfg, sr)[1]
        assert got == cfg.train.segment_size // cfg.data.hop_length == want, (
            sr, got)


def test_safetensors_reader_roundtrip(tmp_path):
    """model.safetensors must be loadable (no safetensors wheel here — the
    minimal reader parses the format directly)."""
    from rvc_tpu.embedders.hubert import _read_safetensors

    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.normal(size=(3, 4)).astype(np.float32),
        "b.bias": rng.normal(size=(5,)).astype(np.float32),
    }
    header = {}
    blobs = []
    off = 0
    for name, arr in tensors.items():
        raw = arr.tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        blobs.append(raw)
        off += len(raw)
    hj = json.dumps(header).encode()
    path = tmp_path / "model.safetensors"
    with open(path, "wb") as f:
        f.write(len(hj).to_bytes(8, "little"))
        f.write(hj)
        f.write(b"".join(blobs))

    out = _read_safetensors(str(path))
    for name, arr in tensors.items():
        assert np.allclose(out[name].numpy(), arr), name


def test_pretrained_selector_flat_layout(tmp_path, monkeypatch):
    """The flat models/pretraineds/ layout the prerequisites message
    describes must be found too, not only the per-vocoder subdir."""
    from rvc_tpu.cli import pretrained_selector

    monkeypatch.chdir(tmp_path)
    base = tmp_path / "models" / "pretraineds"
    base.mkdir(parents=True)
    (base / "f0G48k.pth").write_bytes(b"x")
    (base / "f0D48k.pth").write_bytes(b"x")
    g, d = pretrained_selector("HiFi-GAN", 48000)
    assert g.endswith("f0G48k.pth") and d.endswith("f0D48k.pth")
    # per-vocoder dir still wins when present
    sub = base / "hifi-gan"
    sub.mkdir()
    (sub / "f0G48k.npz").write_bytes(b"x")
    (sub / "f0D48k.npz").write_bytes(b"x")
    g, d = pretrained_selector("HiFi-GAN", 48000)
    assert "hifi-gan" in g and g.endswith(".npz")


def test_fallback_tts_process_stable_seed(tmp_path):
    """The offline TTS seed must not depend on salted hash()."""
    import hashlib

    import rvc_tpu.utils.tts as tts

    out = str(tmp_path / "t.wav")
    tts._fallback_tts("hello world", out)
    from rvc_tpu.utils.audio_io import load_audio

    a = load_audio(out, 16000)
    # the expected seed derivation (matches the implementation; hash()
    # would differ between processes)
    seed = int.from_bytes(
        hashlib.sha256(b"hello world").digest()[:4], "little")
    rng = np.random.default_rng(seed)
    assert a.size > 0 and np.isfinite(a).all()
    assert rng is not None
