"""Preset save/load tests (parity: tabs/inference/inference.py:90-168)."""

from rvc_tpu.utils.presets import list_presets, load_preset, save_preset


def test_preset_roundtrip(tmp_path):
    d = str(tmp_path)
    p = save_preset("mine", {"pitch": 2, "protect": 0.4, "bogus_key": 1}, d)
    loaded = load_preset("mine", d)
    assert loaded == {"pitch": 2, "protect": 0.4}  # unknown keys dropped
    assert list_presets(d) == ["mine"]
    assert load_preset(p) == loaded  # direct path also works


def test_list_presets_empty(tmp_path):
    assert list_presets(str(tmp_path / "none")) == []
