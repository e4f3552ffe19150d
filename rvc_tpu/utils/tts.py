"""Text-to-speech front-end for the TTS->VC chain.

Parity target: rvc/lib/tools/tts.py:1-29 (edge-tts subprocess producing a wav
that then feeds convert_audio, core.py:352-410). edge-tts needs network; in
zero-egress environments a local deterministic formant synthesizer stands in
so the chain stays runnable end-to-end (clearly not production TTS quality).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

from .audio_io import write_wav


def _fallback_tts(text: str, output_path: str, sr: int = 16000) -> None:
    """Deterministic phrase-shaped babble: per-character vowel-like formant
    bursts. Keeps the tts->vc pipeline executable offline."""
    rng = np.random.default_rng(abs(hash(text)) % 2**31)
    dur_per_char = 0.06
    total = max(0.5, len(text) * dur_per_char)
    t = np.arange(int(total * sr)) / sr
    f0 = 140.0 + 20.0 * np.sin(2 * np.pi * 0.8 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    voiced = np.sin(phase) + 0.5 * np.sin(2 * phase) + 0.25 * np.sin(3 * phase)
    # slow formant movement keyed off the text hash
    env = 0.5 + 0.5 * np.sin(2 * np.pi * (1.5 + rng.random()) * t + rng.random())
    audio = (voiced * env * 0.25).astype(np.float32)
    # word-ish amplitude gating
    gate = (np.sin(2 * np.pi * 2.5 * t) > -0.7).astype(np.float32)
    write_wav(output_path, audio * gate, sr, subtype="FLOAT")


def run_tts(text: str, voice: str, rate: int, output_path: str) -> str:
    """Synthesize `text` to `output_path`; edge-tts when available."""
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    if shutil.which("edge-tts"):
        rate_str = f"+{rate}%" if rate >= 0 else f"{rate}%"
        subprocess.run(
            ["edge-tts", "--text", text, "--voice", voice,
             "--rate", rate_str, "--write-media", output_path],
            check=True,
        )
        return output_path
    try:
        import edge_tts  # noqa: F401  (python package route)
        import asyncio

        async def _go():
            rate_str = f"+{rate}%" if rate >= 0 else f"{rate}%"
            com = edge_tts.Communicate(text, voice, rate=rate_str)
            await com.save(output_path)

        asyncio.run(_go())
        return output_path
    except Exception:
        print("edge-tts unavailable (no network?); using offline fallback TTS")
        _fallback_tts(text, output_path)
        return output_path


# A curated subset of edge-tts neural voices (reference ships the full list
# as assets/tts_voices.json, used by the TTS tab's voice picker).
COMMON_VOICES = [
    "en-US-AriaNeural", "en-US-GuyNeural", "en-US-JennyNeural",
    "en-GB-SoniaNeural", "en-GB-RyanNeural", "en-AU-NatashaNeural",
    "es-ES-ElviraNeural", "es-MX-DaliaNeural", "fr-FR-DeniseNeural",
    "de-DE-KatjaNeural", "it-IT-ElsaNeural", "pt-BR-FranciscaNeural",
    "ja-JP-NanamiNeural", "ko-KR-SunHiNeural", "zh-CN-XiaoxiaoNeural",
    "ru-RU-SvetlanaNeural", "hi-IN-SwaraNeural", "ar-SA-ZariyahNeural",
]


def list_voices() -> list:
    """Full voice list via edge-tts when available, else the curated subset."""
    try:
        import asyncio

        import edge_tts

        voices = asyncio.run(edge_tts.list_voices())
        return sorted(v["ShortName"] for v in voices)
    except Exception:
        return list(COMMON_VOICES)
