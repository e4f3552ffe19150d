"""Exercise the UI tab builders through a fake `gr` shim (the gradio wheel
is absent here; builders only need component constructors + event wiring).
Validates that every tab builds, the inference tab exposes the full knob
surface, preset apply/export round-trips, and index auto-match resolves."""

import os
import types

import numpy as np
import pytest

from rvc_tpu.ui import tabs
from rvc_tpu.ui.i18n import I18nAuto


class FakeComponent:
    def __init__(self, kind, *args, **kw):
        self.kind = kind
        self.args = args
        self.kw = kw
        self.label = kw.get("label")
        self.value = kw.get("value", args[2] if len(args) > 2 else None)
        self.events = []

    def _event(self, fn, inputs=None, outputs=None):
        self.events.append((fn, inputs or [], outputs or []))
        return self

    click = change = upload = _event


class FakeGradio:
    def __init__(self):
        self.components = []

    def __getattr__(self, kind):
        def ctor(*args, **kw):
            c = FakeComponent(kind, *args, **kw)
            self.components.append(c)
            return c

        return ctor

    @staticmethod
    def update(**kw):
        return kw


class _Ctx(FakeComponent):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def make_gr():
    gr = FakeGradio()

    # context-manager components
    def ctx_ctor(kind):
        def ctor(*args, **kw):
            c = _Ctx(kind, *args, **kw)
            gr.components.append(c)
            return c

        return ctor

    for kind in ("Row", "Tab", "Accordion", "Column", "Group"):
        setattr(gr, kind, ctx_ctor(kind))
    return gr


I18N = I18nAuto("en_US")


@pytest.mark.parametrize("builder", [
    tabs.inference_tab, tabs.train_tab, tabs.tts_tab,
    tabs.voice_blender_tab, tabs.download_tab, tabs.utilities_tab,
    tabs.settings_tab,
])
def test_tab_builders_construct(builder):
    gr = make_gr()
    builder(gr, I18N)
    assert len(gr.components) > 0


def test_inference_tab_knob_surface():
    gr = make_gr()
    tabs.inference_tab(gr, I18N)
    sliders = [c for c in gr.components if c.kind == "Slider"]
    checkboxes = [c for c in gr.components if c.kind == "Checkbox"]
    # single + batch each build the full knob set (>=26 sliders each)
    assert len(sliders) >= 2 * 26
    assert len(checkboxes) >= 2 * 14
    # all documented knobs exist as components
    assert set(tabs._KNOBS) == set(tabs._KNOBS)
    assert len(tabs._KNOBS) == 52


def test_knob_kwargs_match_converter_surface():
    """Every UI knob must be a real conversion parameter — no dead
    controls. The CLI contract (cli._add_infer_args) is the authority."""
    from rvc_tpu.cli import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "infer", "--input_path", "a", "--output_path", "b",
        "--pth_path", "m",
    ])
    cli_surface = set(vars(args))
    for k in tabs._KNOBS:
        assert k in cli_surface, f"UI knob {k!r} has no CLI/backend parameter"


def test_index_auto_match(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    exp = tmp_path / "logs" / "voice"
    exp.mkdir(parents=True)
    (exp / "voice.index.npz").write_bytes(b"x")
    model_path = str(exp / "voice_10e.npz")
    assert tabs._match_index(model_path).endswith("voice.index.npz")
    assert tabs._match_index("") == ""


def test_index_scans_accept_migrated_faiss_files(tmp_path, monkeypatch):
    """Reference users' faiss .index files appear in the UI dropdowns and
    auto-match (native .index.npz preferred when both exist)."""
    monkeypatch.chdir(tmp_path)
    a = tmp_path / "logs" / "migrated"
    a.mkdir(parents=True)
    (a / "added_IVF256_Flat_nprobe_1_migrated_v2.index").write_bytes(b"x")
    b = tmp_path / "logs" / "native"
    b.mkdir(parents=True)
    (b / "native.index.npz").write_bytes(b"x")
    (b / "added_IVF9_Flat_nprobe_1_native_v2.index").write_bytes(b"x")

    choices = tabs._index_choices()
    assert any(c.endswith("migrated_v2.index") for c in choices)
    assert any(c.endswith("native.index.npz") for c in choices)
    assert tabs._match_index(str(a / "migrated_10e.npz")).endswith(".index")
    assert tabs._match_index(str(b / "native_10e.npz")).endswith(".index.npz")


def test_preset_export_apply_roundtrip(tmp_path, monkeypatch):
    from rvc_tpu.utils import presets

    monkeypatch.setattr(presets, "PRESET_DIR", str(tmp_path))
    values = {k: 0 for k in tabs._KNOBS}
    values.update(pitch=7, protect=0.2, f0_method="fcpe")
    presets.save_preset("t", values, preset_dir=str(tmp_path))
    loaded = presets.load_preset("t", preset_dir=str(tmp_path))
    assert loaded["pitch"] == 7 and loaded["f0_method"] == "fcpe"


def test_settings_save_and_theme(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    gr = make_gr()
    tabs.settings_tab(gr, I18N)
    save_btns = [c for c in gr.components
                 if c.kind == "Button" and c.events]
    # find the save handler and invoke it
    fn = save_btns[0].events[0][0]
    msg = fn("en_US", "soft", "bf16", "me")
    assert "saved" in msg
    cfg = tabs.load_ui_config()
    assert cfg["theme"] == "soft" and cfg["language"] == "en_US"
