"""f0 -> MIDI transcription (predictors/f0_midi.py).

Parity target: rvc/lib/predictors/torchfcpe/f02midi/ — the reference's
pretty_midi/pydub/librosa dependencies are absent here, so behavior is
asserted directly (note math, beat-scaled refinement thresholds, segment
extraction, SMF round trip) rather than diffed against the torch package.
"""

import numpy as np
import pytest

from rvc_tpu.predictors.f0_midi import (
    estimate_tempo,
    f0_to_midi,
    hz_to_note,
    note_to_segments,
    one_beat_frames,
    read_midi_notes,
    refine_note,
    write_midi,
)


def test_hz_to_note_reference_formula():
    # A4=440 -> 69; A3=220 -> 57; unvoiced stays 0 (transpose.py:12-19)
    notes = hz_to_note(np.array([440.0, 220.0, 0.0, 261.63]))
    assert notes.tolist() == [69, 57, 0, 60]  # C4 rounds to 60


def test_one_beat_frames():
    assert one_beat_frames(120.0) == 50  # 0.5 s at 100 fps
    assert one_beat_frames(60.0) == 100


def test_refine_note_removes_short_blips():
    beat = one_beat_frames(120.0)
    note = np.full(6 * beat, 69, np.int64)
    note[beat:beat + 3] = 81  # 3-frame octave blip << beat/4 floor
    out = refine_note(note, 120.0)
    mid = out[out > 0]
    assert (mid == 69).all()  # blip medianed/cleaned away


def test_refine_note_keeps_long_notes():
    beat = one_beat_frames(120.0)
    note = np.concatenate([
        np.full(2 * beat, 60), np.zeros(beat, np.int64),
        np.full(2 * beat, 64),
    ])
    out = refine_note(note, 120.0)
    segs = note_to_segments(out)
    pitches = [p for _, _, p in segs]
    assert 60 in pitches and 64 in pitches


def test_note_to_segments_times():
    note = np.zeros(300, np.int64)
    note[100:200] = 72
    segs = note_to_segments(note)
    assert len(segs) == 1
    s, e, p = segs[0]
    assert p == 72 and s == pytest.approx(1.0) and e == pytest.approx(1.99)


def test_midi_write_read_roundtrip(tmp_path):
    segs = [(0.0, 0.5, 60), (0.5, 1.0, 64), (1.25, 2.0, 67)]
    path = str(tmp_path / "out.mid")
    write_midi(segs, path, tempo=120.0)
    back = read_midi_notes(path)
    assert len(back) == 3
    for (s0, e0, p0), (s1, e1, p1) in zip(segs, back):
        assert p0 == p1
        assert s1 == pytest.approx(s0, abs=0.01)
        assert e1 == pytest.approx(e0, abs=0.01)


def test_midi_tempo_scales_ticks(tmp_path):
    segs = [(0.0, 1.0, 69)]
    p60 = str(tmp_path / "t60.mid")
    p240 = str(tmp_path / "t240.mid")
    write_midi(segs, p60, tempo=60.0)
    write_midi(segs, p240, tempo=240.0)
    # both must decode back to 1 s despite 4x different tick rates
    assert read_midi_notes(p60)[0][1] == pytest.approx(1.0, abs=0.01)
    assert read_midi_notes(p240)[0][1] == pytest.approx(1.0, abs=0.01)


def test_estimate_tempo_click_track():
    sr = 16000
    bpm = 150.0
    t = np.zeros(sr * 8, np.float64)
    period = int(sr * 60 / bpm)
    for i in range(0, len(t) - 200, period):
        t[i:i + 200] += np.hanning(200)  # click
    est = estimate_tempo(t, sr)
    # accept the metrical level itself or its half/double octave
    ratio = est / bpm
    assert min(abs(ratio - r) for r in (0.5, 1.0, 2.0)) < 0.08


def test_f0_to_midi_end_to_end(tmp_path):
    fps = 100
    f0 = np.zeros(400, np.float64)
    f0[50:150] = 440.0   # A4 for 1 s
    f0[200:300] = 523.25  # C5 for 1 s
    path = str(tmp_path / "song.mid")
    segs = f0_to_midi(f0, tempo=120.0, output_path=path, fps=fps)
    pitches = sorted(p for _, _, p in segs)
    assert pitches == [69, 72]
    back = read_midi_notes(path)
    assert sorted(p for _, _, p in back) == [69, 72]


def test_f0_to_midi_defaults_to_120_without_audio():
    f0 = np.concatenate([np.zeros(20), np.full(100, 330.0), np.zeros(20)])
    segs = f0_to_midi(f0)
    assert len(segs) == 1 and segs[0][2] == 64  # E4
