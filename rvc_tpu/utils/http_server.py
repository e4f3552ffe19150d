"""Minimal model-download trigger server.

Parity target: assets/flask/{server.py,routes.py} — a localhost HTTP
endpoint the applio.org website (or any client) can hit to install a model
into the running app: GET /download/<url> triggers the download pipeline,
POST /shutdown stops the server. Implemented over the stdlib http.server
(the flask wheel is not a dependency); runs on a daemon thread inside the
UI process instead of a spawned console.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import unquote

DEFAULT_PORT = 8000


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path.startswith("/download/"):
            url = unquote(self.path[len("/download/"):])
            try:
                from .downloads import model_download_pipeline

                dest = model_download_pipeline(url)
                body = f"downloaded to {dest}".encode()
                self.send_response(200)
            except Exception as e:
                body = f"Error: {e}".encode()
                self.send_response(500)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        if self.path == "/shutdown":
            self.send_response(200)
            self.end_headers()
            threading.Thread(target=self.server.shutdown, daemon=True).start()
        else:
            self.send_response(404)
            self.end_headers()


def start_download_server(port: int = DEFAULT_PORT,
                          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Start the trigger server on a daemon thread; returns the server
    (call .shutdown() or POST /shutdown to stop)."""
    server = ThreadingHTTPServer((host, port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


_SERVER: Optional[ThreadingHTTPServer] = None


def enable_from_config(config_path: str = "logs/ui_config.json") -> bool:
    """Start the server when the UI config enables it (reference reads
    assets/config.json['flask_server'])."""
    global _SERVER
    import json
    import os

    try:
        with open(config_path) as f:
            enabled = bool(json.load(f).get("download_server", False))
    except Exception:
        enabled = False
    if enabled and _SERVER is None:
        try:
            _SERVER = start_download_server()
        except OSError:
            return False
    return _SERVER is not None
