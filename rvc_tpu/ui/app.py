"""Gradio web application (7 tabs).

Parity target: app.py:22-112 (Blocks app on port 7897 with port-retry) and
the tabs/ package: inference, train, tts, voice_blender, download, utilities
(analyzer + f0 extractor), settings (theme/lang/precision/restart). Tab
callbacks call the same library functions the CLI uses — no subprocess layer.

Launching requires the `gradio` wheel; everything degrades to a clear error
without it so the package stays importable in headless environments.
"""

from __future__ import annotations

import os
import sys

from .i18n import I18nAuto

DEFAULT_PORT = 7897
MAX_PORT_RETRIES = 10


def _require_gradio():
    try:
        import gradio as gr

        return gr
    except ImportError:
        # No wheel in this environment: fall back to the vendored stdlib
        # renderer so the UI still launches as a real web app (same Blocks
        # surface; see gradio_lite docstring for scope).
        from . import gradio_lite as gr

        print("[ui] gradio wheel not found - using the vendored "
              "gradio_lite renderer")
        return gr


def build_app():
    gr = _require_gradio()

    # boot-time prerequisites check (reference app.py:33-37 auto-downloads);
    # offline it just reports what is missing, never blocks the UI
    try:
        from ..utils.downloads import prerequisites_download_pipeline

        prerequisites_download_pipeline()
    except Exception as e:
        print(f"prerequisites check skipped ({e})")

    from .tabs import (
        download_tab, inference_tab, load_ui_config, settings_tab,
        train_tab, tts_tab, utilities_tab, voice_blender_tab,
    )

    ui_cfg = load_ui_config()
    i18n = I18nAuto(ui_cfg.get("language") or None)
    theme = ui_cfg.get("theme", "default")
    theme = None if theme in ("default", "", None) else theme

    with gr.Blocks(title="rvc_tpu", theme=theme) as app:
        gr.Markdown("## rvc_tpu — TPU-native voice conversion")
        with gr.Tab(i18n("Inference")):
            inference_tab(gr, i18n)
        with gr.Tab(i18n("Training")):
            train_tab(gr, i18n)
        with gr.Tab(i18n("TTS")):
            tts_tab(gr, i18n)
        with gr.Tab(i18n("Voice Blender")):
            voice_blender_tab(gr, i18n)
        with gr.Tab(i18n("Download")):
            download_tab(gr, i18n)
        with gr.Tab(i18n("Extra")):
            utilities_tab(gr, i18n)
        with gr.Tab(i18n("Settings")):
            settings_tab(gr, i18n)
    return app


def launch(port: int = DEFAULT_PORT, share: bool = False) -> None:
    """Launch with port retry (reference app.py:99-112)."""
    app = build_app()
    for offset in range(MAX_PORT_RETRIES):
        try:
            app.launch(
                server_name="0.0.0.0",
                server_port=port + offset,
                share=share,
                favicon_path=None,
            )
            return
        except OSError:
            print(f"port {port + offset} busy, retrying...")
    raise RuntimeError("no free port found for the UI")


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_PORT
    launch(port)
