"""Exact parity: our Slicer vs the reference's numpy Slicer.

The reference slicer (rvc/train/preprocess/slicer.py:4-196) is pure numpy,
so it can be imported and diffed sample-exactly — no torch involved. The
preprocess 'Automatic' cut mode depends on matching silence cut points
(reference preprocess.py:163-194)."""

import importlib.util
import sys

import numpy as np
import pytest

from rvc_tpu.train.preprocess import Slicer

_REF = "/root/reference/rvc/train/preprocess/slicer.py"


def _load_ref_slicer():
    spec = importlib.util.spec_from_file_location("ref_slicer", _REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_slicer"] = mod
    spec.loader.exec_module(mod)
    return mod.Slicer


def _signal(seed: int, sr: int, spans):
    """Tone bursts separated by near-silence; spans = [(start_s, dur_s), ...]."""
    rng = np.random.default_rng(seed)
    total = max(s + d for s, d in spans) + 1.0
    n = int(total * sr)
    x = rng.normal(size=n).astype(np.float32) * 1e-5  # silence floor
    t = np.arange(n) / sr
    for start, dur in spans:
        i0, i1 = int(start * sr), int((start + dur) * sr)
        x[i0:i1] += 0.4 * np.sin(2 * np.pi * 220.0 * t[i0:i1]).astype(np.float32)
    return x


@pytest.mark.parametrize("case", [
    # long voiced spans with silences longer/shorter than max_sil_kept
    dict(seed=0, spans=[(0.5, 4.0), (11.0, 5.0)], kw={}),
    # short clip returned whole
    dict(seed=1, spans=[(0.1, 1.0)], kw={}),
    # aggressive settings exercised by preprocess 'Automatic'
    dict(seed=2, spans=[(0.2, 2.5), (4.5, 2.0), (9.0, 3.0)],
         kw=dict(threshold=-42.0, min_length=1500, min_interval=400,
                 hop_size=15, max_sil_kept=500)),
    # leading/trailing silence
    dict(seed=3, spans=[(3.0, 2.0)], kw=dict(min_length=1500)),
])
def test_slicer_matches_reference(case):
    RefSlicer = _load_ref_slicer()
    sr = 16000
    x = _signal(case["seed"], sr, case["spans"])
    ours = Slicer(sr=sr, **case["kw"]).slice(x)
    theirs = RefSlicer(sr=sr, **case["kw"]).slice(x)
    assert len(ours) == len(theirs), (
        f"segment count {len(ours)} vs reference {len(theirs)}"
    )
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == np.asarray(b).shape, f"segment {i} shape"
        np.testing.assert_array_equal(a, b, err_msg=f"segment {i}")
