"""Regression tests for the round-2i UI/CLI/configs review findings."""

import os

import numpy as np
import pytest


def test_pretrained_choices_match_staged_names(tmp_path, monkeypatch):
    from rvc_tpu.ui import tabs

    d = tmp_path / "models" / "pretraineds" / "hifi-gan"
    d.mkdir(parents=True)
    (d / "f0G48k.pth").write_bytes(b"x")
    (d / "f0D48k.pth").write_bytes(b"x")
    (d / "G_custom.npz").write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    g = tabs._pretrained_choices("G")
    assert any("f0G48k" in p for p in g), g  # staged default names found
    assert any("G_custom" in p for p in g)
    dd = tabs._pretrained_choices("D")
    assert any("f0D48k" in p for p in dd)


def test_i18n_prefix_fallback(tmp_path):
    import json

    from rvc_tpu.ui.i18n import I18nAuto

    ldir = tmp_path / "languages"
    ldir.mkdir()
    (ldir / "cs_CS.json").write_text(json.dumps({"Convert": "Prevest"}))
    (ldir / "en_US.json").write_text(json.dumps({"Convert": "Convert"}))
    # a cs_CZ locale must find the shipped cs_CS pack
    i = I18nAuto(language="cs_CZ", languages_dir=str(ldir))
    assert i("Convert") == "Prevest"


def test_cli_extract_forwards_hop_length():
    """--hop_length must reach run_extraction (was parsed and dropped)."""
    import inspect

    from rvc_tpu.train.extract import FeatureExtractor, run_extraction

    assert "hop_length" in inspect.signature(run_extraction).parameters
    assert "hop_length" in inspect.signature(FeatureExtractor).parameters


def test_index_algorithm_knob(tmp_path):
    from rvc_tpu.train.index_builder import build_index

    exp = tmp_path / "exp"
    (exp / "extracted").mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.save(exp / "extracted" / "a.npy",
            rng.normal(size=(300, 8)).astype(np.float32))

    flat = build_index(str(exp), str(tmp_path / "flat.npz"),
                       algorithm="Faiss", max_rows=100)
    km = build_index(str(exp), str(tmp_path / "km.npz"),
                     algorithm="KMeans", max_rows=100, n_centroids=16)
    auto = build_index(str(exp), str(tmp_path / "auto.npz"),
                       algorithm="Auto", max_rows=100, n_centroids=16)
    n_flat = np.load(flat)["vectors"].shape[0]
    n_km = np.load(km)["vectors"].shape[0]
    n_auto = np.load(auto)["vectors"].shape[0]
    assert n_flat == 300       # Faiss: never compressed
    assert n_km == 16          # KMeans: always compressed
    assert n_auto == 16        # Auto: above max_rows -> compressed


def test_tts_text_not_required():
    from rvc_tpu.cli import build_parser

    p = build_parser()
    # file-based TTS must parse without --tts_text
    args = p.parse_args([
        "tts", "--tts_voice", "v", "--input_path", "t.txt",
        "--output_tts_path", "a.wav", "--output_rvc_path", "b.wav",
        "--pth_path", "m.npz",
    ])
    assert args.tts_text is None


def test_extract_defaults_to_staged_rmvpe(tmp_path, monkeypatch, capsys):
    """FeatureExtractor with rmvpe and no explicit ckpt must look at the
    staged models/predictors path (UI passes nothing)."""
    monkeypatch.chdir(tmp_path)
    from rvc_tpu.train.extract import FeatureExtractor

    FeatureExtractor("rmvpe", rmvpe_ckpt=None, batch_size=1)
    out = capsys.readouterr().out
    # absent here -> warning names the canonical default path
    assert "models/predictors/rmvpe.pt" in out


def test_cleanup_previous_run(tmp_path):
    from rvc_tpu.cli import cleanup_previous_run

    exp = tmp_path / "m"
    exp.mkdir()
    for fn in ("G_1.npz", "D_1.npz", "m.index.npz", "metrics.jsonl",
               "heartbeat.json", "filelist.txt", "config.json", "m_5e.npz"):
        (exp / fn).write_text("x")
    n = cleanup_previous_run(str(exp))
    left = sorted(os.listdir(exp))
    # training state removed; dataset config + deployable export kept
    # (reference train.py:377-403 semantics)
    assert n == 5
    assert left == ["config.json", "filelist.txt", "m_5e.npz"]
    assert cleanup_previous_run(str(tmp_path / "missing")) == 0
