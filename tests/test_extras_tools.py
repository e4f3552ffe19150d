"""EXTRAS-parity tools: slicer, blender-GUI helpers, process killer
(reference EXTRAS/{slice_gui,model_blender_gui,py_kill}.py)."""

import json
import os

import numpy as np
import pytest

from rvc_tpu.utils.audio_io import save_audio
from rvc_tpu.utils.blender_gui import normalize_sr
from rvc_tpu.utils.py_kill import framework_pids, kill_pids
from rvc_tpu.utils.slice_gui import slice_file


def _write_tone(path, seconds=4.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    save_audio(str(path), audio, sr)
    return audio, sr


def test_slice_fixed_mode(tmp_path):
    wav = tmp_path / "in.wav"
    _write_tone(wav, seconds=4.0)
    out = slice_file(str(wav), str(tmp_path / "out"), mode="fixed",
                     slice_ms=1000)
    # 4 s at 1 s windows -> 4 full chunks (no short tail)
    assert len(out) == 4
    assert all(os.path.exists(p) for p in out)


def test_slice_fixed_drops_short_tail(tmp_path):
    wav = tmp_path / "in.wav"
    _write_tone(wav, seconds=3.1)
    out = slice_file(str(wav), str(tmp_path / "out"), mode="fixed",
                     slice_ms=1000, min_keep_ms=300)
    # 100 ms tail is under min_keep_ms
    assert len(out) == 3


def test_slice_silence_mode_runs(tmp_path):
    sr = 16000
    t = np.arange(sr * 6) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio[2 * sr : 4 * sr] = 0.0  # long silence in the middle
    wav = tmp_path / "in.wav"
    save_audio(str(wav), audio, sr)
    out = slice_file(str(wav), str(tmp_path / "out"), mode="silence")
    assert len(out) >= 1


def test_slice_unknown_mode(tmp_path):
    wav = tmp_path / "in.wav"
    _write_tone(wav, seconds=1.0)
    with pytest.raises(ValueError):
        slice_file(str(wav), str(tmp_path / "out"), mode="nope")


def test_normalize_sr():
    assert normalize_sr("48k") == 48000
    assert normalize_sr("40K") == 40000
    assert normalize_sr(32000) == 32000
    assert normalize_sr("weird") == "weird"


def test_framework_pids_reads_heartbeats(tmp_path):
    exp = tmp_path / "exp1"
    exp.mkdir()
    # own pid is excluded; a dead pid is excluded; nonsense is skipped
    with open(exp / "heartbeat.json", "w") as f:
        json.dump({"pid": os.getpid()}, f)
    exp2 = tmp_path / "exp2"
    exp2.mkdir()
    with open(exp2 / "heartbeat.json", "w") as f:
        json.dump({"pid": 2 ** 22 + 12345}, f)  # almost surely dead
    assert framework_pids(str(tmp_path)) == []


def test_kill_pids_tolerates_dead():
    assert kill_pids([2 ** 22 + 12345]) == 0
