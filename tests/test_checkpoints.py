"""Checkpoint format + model tools tests (parity targets cited in
rvc_tpu/utils/checkpoints.py and model_tools.py)."""

import numpy as np
import pytest

from rvc_tpu.utils.checkpoints import (
    load_checkpoint, normalize_weight_norm_keys, save_checkpoint,
)
from rvc_tpu.utils.model_tools import _blend_trees, model_blender, model_information

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def test_save_load_roundtrip(tmp_path):
    params = {
        "enc": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "dec": {"deep": {"b": np.ones(4, np.float32)}},
    }
    p = str(tmp_path / "ckpt.npz")
    h = save_checkpoint(p, params, {"epoch": 7, "sample_rate": 48000})
    loaded, meta = load_checkpoint(p)
    assert meta["epoch"] == 7 and meta["model_hash"] == h
    np.testing.assert_array_equal(np.asarray(loaded["enc"]["w"]), params["enc"]["w"])
    np.testing.assert_array_equal(
        np.asarray(loaded["dec"]["deep"]["b"]), params["dec"]["deep"]["b"]
    )


def test_hash_changes_with_weights(tmp_path):
    a = {"w": np.zeros(3, np.float32)}
    b = {"w": np.ones(3, np.float32)}
    h1 = save_checkpoint(str(tmp_path / "a.npz"), a, {})
    h2 = save_checkpoint(str(tmp_path / "b.npz"), b, {})
    assert h1 != h2


def test_normalize_weight_norm_keys():
    sd = {
        "dec.ups.0.parametrizations.weight.original0": 1,
        "dec.ups.0.parametrizations.weight.original1": 2,
        "enc.w": 3,
    }
    out = normalize_weight_norm_keys(sd)
    assert out["dec.ups.0.weight_g"] == 1
    assert out["dec.ups.0.weight_v"] == 2
    assert out["enc.w"] == 3


def test_blend_trees_alpha_and_shape_mismatch():
    a = {"emb": np.ones((4, 2), np.float32)}
    b = {"emb": np.zeros((6, 2), np.float32)}
    out = _blend_trees(a, b, 0.25)
    assert out["emb"].shape == (4, 2)  # min-shape crop (model_blender.py:69-75)
    assert out["emb"][0, 0] == pytest.approx(0.25)


def test_model_blender_end_to_end(tmp_path):
    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")
    save_checkpoint(p1, {"w": np.full(3, 2.0, np.float32)}, {"sample_rate": 48000})
    save_checkpoint(p2, {"w": np.zeros(3, np.float32)}, {"sample_rate": 48000})
    out = model_blender("fused", p1, p2, ratio=0.5, output_dir=str(tmp_path))
    params, meta = load_checkpoint(out)
    np.testing.assert_allclose(np.asarray(params["w"]), np.ones(3), rtol=1e-6)
    assert meta["blend_ratio"] == 0.5


def test_model_blender_rejects_rate_mismatch(tmp_path):
    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")
    save_checkpoint(p1, {"w": np.zeros(1, np.float32)}, {"sample_rate": 48000})
    save_checkpoint(p2, {"w": np.zeros(1, np.float32)}, {"sample_rate": 32000})
    with pytest.raises(ValueError):
        model_blender("x", p1, p2)


def test_model_information_prints(tmp_path, capsys):
    p = str(tmp_path / "m.npz")
    save_checkpoint(p, {"w": np.zeros(5, np.float32)}, {"epoch": 3})
    info = model_information(p)
    assert info["epoch"] == 3
    assert "epoch" in capsys.readouterr().out
