"""End-to-end preprocess -> extract -> filelist -> index on synthetic data
(parity targets cited in rvc_tpu/train/preprocess.py and extract.py)."""

import os

import numpy as np
import pytest

from rvc_tpu.train.preprocess import (
    PreProcess, Slicer, frame_rms, preprocess_training_set, spectral_gate,
)
from rvc_tpu.train.extract import coarse_f0_train
from rvc_tpu.utils.audio_io import write_wav

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini

SR = 32000


def _tone(seconds, freq=220.0, sr=SR, amp=0.3):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_frame_rms_constant_signal():
    x = np.full(1000, 0.5, np.float32)
    rms = frame_rms(x, 100, 50)
    assert rms[len(rms) // 2] == pytest.approx(0.5, rel=1e-3)


def test_slicer_splits_on_silence():
    sr = SR
    seg = _tone(2.0)
    silence = np.zeros(sr, np.float32)
    audio = np.concatenate([seg, silence, seg])
    sl = Slicer(sr=sr, threshold=-42, min_length=1500, min_interval=400,
                hop_size=15, max_sil_kept=500)
    chunks = sl.slice(audio)
    assert len(chunks) >= 2
    assert sum(len(c) for c in chunks) <= len(audio)


def test_slicer_returns_whole_short_audio():
    sl = Slicer(sr=SR, threshold=-42, min_length=1500, min_interval=400,
                hop_size=15, max_sil_kept=500)
    x = _tone(0.5)
    assert len(sl.slice(x)) == 1


def test_spectral_gate_reduces_noise_floor():
    rng = np.random.default_rng(0)
    noise = (rng.normal(size=SR) * 0.01).astype(np.float32)
    sig = _tone(1.0) + noise
    out = spectral_gate(sig, SR, 0.9)
    assert out.shape == sig.shape and np.isfinite(out).all()


def test_preprocess_training_set_writes_dual_rate(tmp_path):
    ds = tmp_path / "dataset"
    ds.mkdir()
    write_wav(str(ds / "a.wav"), _tone(4.0), SR, subtype="FLOAT")
    exp = str(tmp_path / "exp")
    hours = preprocess_training_set(
        str(ds), SR, exp, cut_preprocess="Simple", process_effects=True,
        num_workers=1,
    )
    assert hours > 0
    gt = os.listdir(os.path.join(exp, "sliced_audios"))
    w16 = os.listdir(os.path.join(exp, "sliced_audios_16k"))
    assert gt and sorted(gt) == sorted(w16)


def test_coarse_f0_train_bins():
    f0 = np.array([0.0, 50.0, 440.0, 1100.0], np.float64)
    c = coarse_f0_train(f0)
    assert c[0] == 1 and c[3] == 255
    assert 1 <= c[2] < 255


@pytest.mark.slow
def test_extract_and_index_end_to_end(tmp_path):
    """preprocess -> extract (yin f0 + random-init embedder) -> filelist ->
    index build; validates the whole artifact layout contract."""
    from rvc_tpu.train.extract import run_extraction
    from rvc_tpu.train.index_builder import build_index
    from rvc_tpu.train.data import parse_filelist

    ds = tmp_path / "dataset"
    ds.mkdir()
    write_wav(str(ds / "a.wav"), _tone(4.0), SR, subtype="FLOAT")
    exp = str(tmp_path / "exp")
    preprocess_training_set(
        str(ds), SR, exp, cut_preprocess="Simple", num_workers=1
    )
    run_extraction(exp, f0_method="yin", include_mutes=1, sample_rate=SR,
                   batch_size=2)
    rows = parse_filelist(os.path.join(exp, "filelist.txt"))
    assert rows, "filelist is empty"
    for r in rows:
        assert os.path.exists(r.wav_path)
        assert os.path.exists(r.feats_path)
        feats = np.load(r.feats_path)
        f0c = np.load(r.f0_coarse_path)
        assert feats.shape[1] == 768
        assert f0c.min() >= 1 and f0c.max() <= 255
    index_path = build_index(exp)
    assert os.path.exists(index_path)


@pytest.mark.slow
def test_feature_extractor_fcpe_and_crepe_tiny():
    """Every f0 method the extract CLI offers (cli.py:172) must actually
    work in FeatureExtractor — fcpe and crepe ride the predictor registry."""
    from rvc_tpu.train.extract import FeatureExtractor

    sr16 = 16000
    t = np.arange(int(1.0 * sr16)) / sr16
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    for method in ("fcpe", "crepe-tiny"):
        fe = FeatureExtractor(f0_method=method, batch_size=2)
        f0s = fe.compute_f0_batch([tone, tone[: sr16 // 2]])
        assert len(f0s) == 2
        for w, f0 in zip((tone, tone[: sr16 // 2]), f0s):
            # plumbing contract only: predictors run RANDOM-INIT here (no
            # checkpoints in this environment), so values are meaningless —
            # accuracy is covered by tests/test_torch_parity.py with
            # converted weights
            assert len(f0) == len(w) // 160 + 1
            assert np.isfinite(f0).all() and (f0 >= 0).all(), method


def test_spectral_gate_noisereduce_behavior():
    """Stationary spectral gate: bursty harmonic content survives, gaps are
    attenuated, and clean_strength scales the reduction (noisereduce
    semantics, preprocess.spectral_gate)."""
    rng = np.random.default_rng(0)
    sr = 48000
    t = np.arange(sr * 3) / sr
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float32)
    saw = sum(np.sin(2 * np.pi * k * 150 * t) / k for k in range(1, 40))
    mixed = (0.25 * saw * env
             + rng.normal(size=len(t)) * 0.02).astype(np.float32)
    from rvc_tpu.train.preprocess import spectral_gate

    on, off = env > 0.5, env <= 0.5
    reductions = []
    for strength in (0.5, 0.9):
        out = spectral_gate(mixed, sr, strength)
        burst_keep = np.sqrt(np.mean(out[on] ** 2)) / np.sqrt(np.mean(mixed[on] ** 2))
        gap_cut = np.sqrt(np.mean(out[off] ** 2)) / np.sqrt(np.mean(mixed[off] ** 2))
        assert burst_keep > 0.7, burst_keep
        assert gap_cut < 0.6, gap_cut
        reductions.append(gap_cut)
    assert reductions[1] < reductions[0]  # strength scales the gate


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/logs/mute"),
    reason="reference fixtures not mounted",
)
def test_mute_rows_match_reference_fixtures():
    """Our synthesized silent filler rows must agree with the reference's
    shipped logs/mute fixtures (preparing_files.py:50-63): 301 f0 frames
    for the 3 s mute, float f0 all zero, coarse f0 all ones, and the
    hubert feature row at 149x768 (the 320-sample frame-rate arithmetic)."""
    ref_f0c = np.load("/root/reference/logs/mute/f0/mute.wav.npy")
    ref_f0f = np.load("/root/reference/logs/mute/f0_voiced/mute.wav.npy")
    ref_emb = np.load("/root/reference/logs/mute/extracted/mute.npy")

    n_frames = 3 * 16000 // 160 + 1
    f0 = np.zeros(n_frames, np.float64)
    coarse = coarse_f0_train(f0)

    assert f0.shape == ref_f0f.shape and (ref_f0f == 0).all()
    assert coarse.shape == ref_f0c.shape
    assert set(np.unique(coarse)) == set(np.unique(ref_f0c)) == {1}
    # feature frame count from the hubert stride chain on 3 s of 16 kHz
    hub_frames = (3 * 16000 - 400) // 320 + 1
    assert ref_emb.shape == (hub_frames, 768)
