"""Unit tests for the vendored gradio_lite renderer (ui/gradio_lite.py).

The UI layer's runtime evidence is scripts/drive_ui.py (committed artifact
docs/artifacts/ui_r5/); these tests pin the renderer's contract in CI:
component-tree building, event dispatch + value coercion, update()
patches, audio encoding, page rendering, and the live HTTP surface that
app.launch's port-retry relies on.
"""

import json
import socket
import urllib.request

import numpy as np
import pytest

from rvc_tpu.ui import gradio_lite as gr


def _build_app():
    with gr.Blocks(title="t") as app:
        gr.Markdown("## hello")
        with gr.Tab("One"):
            with gr.Row():
                name = gr.Textbox(label="Name", value="w")
                n = gr.Slider(0, 10, 2, step=1, label="N")
                flag = gr.Checkbox(value=False, label="Flag")
            pick = gr.Dropdown(choices=["a", "b"], label="Pick")
            out = gr.Textbox(label="Out")
            btn = gr.Button("Go")

            def go(name, n, flag, pick):
                return f"{name}:{int(n) * 2}:{flag}:{pick}"

            btn.click(go, [name, n, flag, pick], [out])

            au = gr.Audio(label="Audio out")
            mk = gr.Button("Make")
            mk.click(lambda: (8000, np.zeros(800, np.float32)), [], [au])

            drop = gr.Dropdown(choices=["x"], label="Dyn")
            upd = gr.Button("Upd")
            upd.click(lambda: gr.update(choices=["p", "q"], value="q"),
                      [], [drop])
        with gr.Tab("Two"):
            gr.JSON(label="J")
    return app


def test_component_tree_and_config():
    app = _build_app()
    kinds = [c.kind for c in app.components]
    for k in ("markdown", "tab", "row", "textbox", "slider", "checkbox",
              "dropdown", "button", "audio", "json"):
        assert k in kinds, k
    cfg = app.config()
    assert len(cfg["events"]) == 3
    ev = cfg["events"][0]
    assert ev["trigger"] == "click" and len(ev["inputs"]) == 4
    # every component has a unique id
    ids = [c["id"] for c in cfg["components"]]
    assert len(set(ids)) == len(ids)


def test_call_event_coerces_and_dispatches():
    app = _build_app()
    res = app.call_event(0, ["v", "3", "true", "b"])  # raw browser strings
    patch = res["data"][0]
    # checkbox "true" -> True, slider step=1 "3" -> int 3
    assert patch["value"] == "v:6:True:b"
    assert patch["kind"] == "textbox"


def test_call_event_audio_tuple_writes_wav(tmp_path):
    app = _build_app()
    res = app.call_event(1, [])
    patch = res["data"][0]
    assert patch["kind"] == "audio"
    assert patch["value"].endswith(".wav")
    assert patch["url"].startswith("/file?p=")
    import wave

    with wave.open(patch["value"]) as w:
        assert w.getframerate() == 8000
        assert w.getnframes() == 800


def test_update_patch_changes_choices():
    app = _build_app()
    res = app.call_event(2, [])
    patch = res["data"][0]
    assert patch["choices"] == ["p", "q"] and patch["value"] == "q"
    # server-side state stays in sync for later re-renders
    drop = next(c for c in app.components
                if c.kind == "dropdown" and c.label == "Dyn")
    assert drop.choices == ["p", "q"] and drop.value == "q"


def test_render_page_structure():
    app = _build_app()
    page = app.render_page()
    assert page.count('class="tabbtn"') == 2
    assert "hello</h2>" in page
    assert 'id="' in page and "const EVENTS" in page


def test_http_surface_and_port_retry(tmp_path):
    app = _build_app()
    app.launch(server_name="127.0.0.1", server_port=0,
               prevent_thread_lock=True)
    try:
        port = app.server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/", timeout=10).read().decode()
        assert "tabbtn" in page
        cfg = json.loads(urllib.request.urlopen(
            f"{base}/config", timeout=10).read())
        assert len(cfg["events"]) == 3
        req = urllib.request.Request(
            f"{base}/api/0",
            data=json.dumps({"data": ["x", 1, False, "a"]}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert out["data"][0]["value"] == "x:2:False:a"
        # file endpoint serves (and 404s outside)
        p = tmp_path / "f.txt"
        p.write_text("hi")
        got = urllib.request.urlopen(
            f"{base}/file?p={p}", timeout=10).read()
        assert got == b"hi"
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/file?p=/nonexistent", timeout=10)
        # occupied port raises OSError (app.py's port-retry contract)
        app2 = _build_app()
        with pytest.raises(OSError):
            app2.launch(server_name="127.0.0.1", server_port=port,
                        prevent_thread_lock=True)
    finally:
        app.close()


def test_build_app_falls_back_to_lite(monkeypatch):
    """_require_gradio returns the vendored renderer when the wheel is
    absent (it is in this environment)."""
    from rvc_tpu.ui.app import _require_gradio

    mod = _require_gradio()
    assert hasattr(mod, "Blocks") and hasattr(mod, "update")
