"""Regression tests for the round-2 third self-review batch.

Each test pins one finding from the post-55df1e6 code review: stale-embedder
cache hits, prefetch swallowing loader errors, float32-wav bucket lengths,
packed-batch option drops, overlapping split intervals, the per-sample
envelope loop, chorus np.roll wraparound, the cutoff==1 lifter, and
zero-peak normalization NaNs.
"""

import numpy as np
import pytest
import scipy.signal as sps

from rvc_tpu.utils.audio_io import wav_frames, write_wav


def test_wav_frames_exact_for_float32_and_pcm16(tmp_path):
    # header-based frame count must be exact for BOTH sample formats (the
    # old filesize//2 guess doubled float32 lengths)
    wav = (np.random.default_rng(0).normal(size=12345) * 0.1).astype(np.float32)
    p32 = str(tmp_path / "f32.wav")
    p16 = str(tmp_path / "i16.wav")
    write_wav(p32, wav, 48000, subtype="FLOAT")
    write_wav(p16, wav, 48000, subtype="PCM_16")
    assert wav_frames(p32) == 12345
    assert wav_frames(p16) == 12345
    assert wav_frames(str(tmp_path / "missing.wav")) is None
    bad = tmp_path / "notwav.wav"
    bad.write_bytes(b"not a riff file at all")
    assert wav_frames(str(bad)) is None


def test_dataset_lengths_exact_for_float32_wavs(tmp_path):
    from rvc_tpu.train.data import FileListRow, VCDataset

    hop = 480
    n = 300 * hop
    wav = np.zeros(n, np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, 48000, subtype="FLOAT")
    row = FileListRow(p, "x", "x", "x", 0)
    ds = VCDataset([row], 48000, 2048, hop, 2048)
    # float32 payload is 4 bytes/sample; the old 2-byte guess said ~600
    assert ds.lengths[0] == 300


def test_prefetch_propagates_worker_exception():
    from rvc_tpu.train.trainer import Trainer

    def bad_iter():
        yield 1
        raise ValueError("corrupt wav mid-epoch")

    got = []
    with pytest.raises(ValueError, match="corrupt wav"):
        for item in Trainer._prefetch(None, bad_iter()):
            got.append(item)
    assert got == [1]  # items before the failure still arrive


def test_get_vc_detects_embedder_change(monkeypatch):
    import rvc_tpu.infer.converter as conv_mod
    from rvc_tpu.infer.converter import VoiceConverter

    vc = VoiceConverter()
    vc.loaded_model = "model.npz"
    vc.pipeline = object()
    vc.last_embedder = "contentvec"

    def boom(path):
        raise RuntimeError("reload attempted")

    monkeypatch.setattr(conv_mod, "load_checkpoint", boom)
    # same model + same embedder: cache hit, no reload
    vc.get_vc("model.npz", embedder_model="contentvec")
    # same model, DIFFERENT embedder: must rebuild (reaches the loader)
    with pytest.raises(RuntimeError, match="reload attempted"):
        vc.get_vc("model.npz", embedder_model="spin")
    # custom embedder path also busts the cache
    vc.last_embedder = "contentvec"
    with pytest.raises(RuntimeError, match="reload attempted"):
        vc.get_vc("model.npz", embedder_model="contentvec",
                  embedder_model_custom="/tmp/custom.npz")


def test_batch_pack_falls_back_to_serial_for_split_audio(tmp_path, monkeypatch):
    from rvc_tpu.infer.converter import VoiceConverter

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    write_wav(str(indir / "a.wav"), np.zeros(1600, np.float32), 16000)
    write_wav(str(indir / "b.wav"), np.zeros(1600, np.float32), 16000)

    vc = VoiceConverter()
    calls = []
    monkeypatch.setattr(
        vc, "convert_audio",
        lambda inp, outp, **kw: calls.append((inp, kw)), raising=False,
    )
    # split_audio cannot be packed; every file must take the serial path
    vc.convert_audio_batch(str(indir), str(outdir), batch_pack=True,
                           split_audio=True)
    assert len(calls) == 2
    assert all(kw.get("split_audio") for _, kw in calls)


def test_process_audio_intervals_never_overlap():
    from rvc_tpu.utils.split_audio import merge_audio, process_audio

    sr = 16000
    rng = np.random.default_rng(3)
    loud = (rng.normal(size=sr) * 0.4).astype(np.float32)
    # ~310 ms pause: exactly one sub-threshold frame between two loud runs
    audio = np.concatenate([loud, np.zeros(int(0.31 * sr), np.float32), loud])
    segments, intervals = process_audio(audio, sr)
    for j in range(len(intervals) - 1):
        assert intervals[j][1] <= intervals[j + 1][0]
    # identity "conversion": overlapping intervals would duplicate audio and
    # make the merge LONGER than the input
    merged = merge_audio(segments, segments, intervals, sr, sr)
    assert len(merged) <= len(audio)


def test_envelope_matches_exact_recurrence():
    from rvc_tpu.infer.postprocess import _envelope

    sr, atk_ms, rel_ms = 16000, 1.0, 100.0
    rng = np.random.default_rng(7)
    x = np.abs(rng.normal(size=5000)).astype(np.float32)
    rel = np.exp(-1.0 / (sr * rel_ms / 1000.0))
    atk = np.exp(-1.0 / (sr * atk_ms / 1000.0))
    r = np.empty(len(x))
    e = 0.0
    for i, v in enumerate(x):
        e = max(float(v), rel * e)
        r[i] = e
    ref = sps.lfilter([1 - atk], [1, -atk], r)
    got = _envelope(x, sr, atk_ms, rel_ms)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_chorus_feedback_does_not_wrap():
    from rvc_tpu.infer.postprocess import chorus

    sr = 48000
    audio = np.zeros(sr, np.float32)
    audio[sr // 2:] = 0.5  # energy only in the second half
    out = chorus(audio, sr, feedback=0.5)
    # np.roll would smear the loud tail into the first samples
    assert np.abs(out[:300]).max() == 0.0


def test_formant_lifter_keeps_excitation_at_cutoff_one():
    from rvc_tpu.infer.formant import formant_shift

    sr = 16000
    rng = np.random.default_rng(11)
    a = (rng.normal(size=sr) * 0.2).astype(np.float32)
    # quefrency small enough that int(q*1e-3*sr) == 0 -> cutoff floor of 1
    out = formant_shift(a, sr, quefrency_ms=0.05, timbre=1.3)
    assert np.all(np.isfinite(out))
    # the buggy lifter zeroed the excitation entirely, warping the whole
    # spectrum: output magnitude spectra were then exactly the warped input.
    # With excitation preserved, the output keeps broadband energy.
    assert np.abs(out).max() > 0.01


def test_normalize_rejects_silent_audio(tmp_path):
    from rvc_tpu.train.preprocess import PreProcess

    pp = PreProcess(40000, str(tmp_path))
    assert pp._normalize(np.zeros(4000, np.float32)) is None
    ok = pp._normalize(np.full(4000, 0.1, np.float32))
    assert ok is not None and np.all(np.isfinite(ok))
