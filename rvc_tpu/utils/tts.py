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
    import hashlib

    # process-stable seed (hash() is salted per process and would break
    # the documented determinism)
    seed = int.from_bytes(
        hashlib.sha256(text.encode("utf-8")).digest()[:4], "little")
    rng = np.random.default_rng(seed)
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


# Static edge-tts neural-voice catalog for the TTS tab's voice picker
# (reference ships the equivalent as assets/tts_voices.json and feeds it to
# the dropdown in tabs/tts/tts.py). One female + one male voice per locale
# where the service provides both; used offline, refreshed live via
# list_voices() when edge-tts has network access.
COMMON_VOICES = [
    "af-ZA-AdriNeural", "af-ZA-WillemNeural",
    "am-ET-AmehaNeural", "am-ET-MekdesNeural",
    "ar-EG-SalmaNeural", "ar-EG-ShakirNeural",
    "ar-SA-HamedNeural", "ar-SA-ZariyahNeural",
    "az-AZ-BabekNeural", "az-AZ-BanuNeural",
    "bg-BG-BorislavNeural", "bg-BG-KalinaNeural",
    "bn-BD-NabanitaNeural", "bn-BD-PradeepNeural",
    "bn-IN-BashkarNeural", "bn-IN-TanishaaNeural",
    "bs-BA-GoranNeural", "bs-BA-VesnaNeural",
    "ca-ES-EnricNeural", "ca-ES-JoanaNeural",
    "cs-CZ-AntoninNeural", "cs-CZ-VlastaNeural",
    "cy-GB-AledNeural", "cy-GB-NiaNeural",
    "da-DK-ChristelNeural", "da-DK-JeppeNeural",
    "de-AT-IngridNeural", "de-AT-JonasNeural",
    "de-CH-JanNeural", "de-CH-LeniNeural",
    "de-DE-AmalaNeural", "de-DE-ConradNeural", "de-DE-KatjaNeural",
    "el-GR-AthinaNeural", "el-GR-NestorasNeural",
    "en-AU-NatashaNeural", "en-AU-WilliamNeural",
    "en-CA-ClaraNeural", "en-CA-LiamNeural",
    "en-GB-LibbyNeural", "en-GB-RyanNeural", "en-GB-SoniaNeural",
    "en-IE-ConnorNeural", "en-IE-EmilyNeural",
    "en-IN-NeerjaNeural", "en-IN-PrabhatNeural",
    "en-NZ-MitchellNeural", "en-NZ-MollyNeural",
    "en-US-AnaNeural", "en-US-AriaNeural", "en-US-ChristopherNeural",
    "en-US-EricNeural", "en-US-GuyNeural", "en-US-JennyNeural",
    "en-US-MichelleNeural", "en-US-RogerNeural", "en-US-SteffanNeural",
    "en-ZA-LeahNeural", "en-ZA-LukeNeural",
    "es-AR-ElenaNeural", "es-AR-TomasNeural",
    "es-CO-GonzaloNeural", "es-CO-SalomeNeural",
    "es-ES-AlvaroNeural", "es-ES-ElviraNeural",
    "es-MX-DaliaNeural", "es-MX-JorgeNeural",
    "es-US-AlonsoNeural", "es-US-PalomaNeural",
    "et-EE-AnuNeural", "et-EE-KertNeural",
    "eu-ES-AinhoaNeural", "eu-ES-AnderNeural",
    "fa-IR-DilaraNeural", "fa-IR-FaridNeural",
    "fi-FI-HarriNeural", "fi-FI-NooraNeural",
    "fil-PH-AngeloNeural", "fil-PH-BlessicaNeural",
    "fr-BE-CharlineNeural", "fr-BE-GerardNeural",
    "fr-CA-AntoineNeural", "fr-CA-SylvieNeural",
    "fr-CH-ArianeNeural", "fr-CH-FabriceNeural",
    "fr-FR-DeniseNeural", "fr-FR-HenriNeural",
    "ga-IE-ColmNeural", "ga-IE-OrlaNeural",
    "gl-ES-RoiNeural", "gl-ES-SabelaNeural",
    "gu-IN-DhwaniNeural", "gu-IN-NiranjanNeural",
    "he-IL-AvriNeural", "he-IL-HilaNeural",
    "hi-IN-MadhurNeural", "hi-IN-SwaraNeural",
    "hr-HR-GabrijelaNeural", "hr-HR-SreckoNeural",
    "hu-HU-NoemiNeural", "hu-HU-TamasNeural",
    "id-ID-ArdiNeural", "id-ID-GadisNeural",
    "is-IS-GudrunNeural", "is-IS-GunnarNeural",
    "it-IT-DiegoNeural", "it-IT-ElsaNeural", "it-IT-IsabellaNeural",
    "ja-JP-KeitaNeural", "ja-JP-NanamiNeural",
    "jv-ID-DimasNeural", "jv-ID-SitiNeural",
    "ka-GE-EkaNeural", "ka-GE-GiorgiNeural",
    "kk-KZ-AigulNeural", "kk-KZ-DauletNeural",
    "km-KH-PisethNeural", "km-KH-SreymomNeural",
    "kn-IN-GaganNeural", "kn-IN-SapnaNeural",
    "ko-KR-InJoonNeural", "ko-KR-SunHiNeural",
    "lo-LA-ChanthavongNeural", "lo-LA-KeomanyNeural",
    "lt-LT-LeonasNeural", "lt-LT-OnaNeural",
    "lv-LV-EveritaNeural", "lv-LV-NilsNeural",
    "mk-MK-AleksandarNeural", "mk-MK-MarijaNeural",
    "ml-IN-MidhunNeural", "ml-IN-SobhanaNeural",
    "mn-MN-BataaNeural", "mn-MN-YesuiNeural",
    "mr-IN-AarohiNeural", "mr-IN-ManoharNeural",
    "ms-MY-OsmanNeural", "ms-MY-YasminNeural",
    "mt-MT-GraceNeural", "mt-MT-JosephNeural",
    "my-MM-NilarNeural", "my-MM-ThihaNeural",
    "nb-NO-FinnNeural", "nb-NO-PernilleNeural",
    "ne-NP-HemkalaNeural", "ne-NP-SagarNeural",
    "nl-BE-ArnaudNeural", "nl-BE-DenaNeural",
    "nl-NL-ColetteNeural", "nl-NL-MaartenNeural",
    "pl-PL-MarekNeural", "pl-PL-ZofiaNeural",
    "ps-AF-GulNawazNeural", "ps-AF-LatifaNeural",
    "pt-BR-AntonioNeural", "pt-BR-FranciscaNeural",
    "pt-PT-DuarteNeural", "pt-PT-RaquelNeural",
    "ro-RO-AlinaNeural", "ro-RO-EmilNeural",
    "ru-RU-DmitryNeural", "ru-RU-SvetlanaNeural",
    "si-LK-SameeraNeural", "si-LK-ThiliniNeural",
    "sk-SK-LukasNeural", "sk-SK-ViktoriaNeural",
    "sl-SI-PetraNeural", "sl-SI-RokNeural",
    "so-SO-MuuseNeural", "so-SO-UbaxNeural",
    "sq-AL-AnilaNeural", "sq-AL-IlirNeural",
    "sr-RS-NicholasNeural", "sr-RS-SophieNeural",
    "su-ID-JajangNeural", "su-ID-TutiNeural",
    "sv-SE-MattiasNeural", "sv-SE-SofieNeural",
    "sw-KE-RafikiNeural", "sw-KE-ZuriNeural",
    "ta-IN-PallaviNeural", "ta-IN-ValluvarNeural",
    "te-IN-MohanNeural", "te-IN-ShrutiNeural",
    "th-TH-NiwatNeural", "th-TH-PremwadeeNeural",
    "tr-TR-AhmetNeural", "tr-TR-EmelNeural",
    "uk-UA-OstapNeural", "uk-UA-PolinaNeural",
    "ur-PK-AsadNeural", "ur-PK-UzmaNeural",
    "uz-UZ-MadinaNeural", "uz-UZ-SardorNeural",
    "vi-VN-HoaiMyNeural", "vi-VN-NamMinhNeural",
    "zh-CN-XiaoxiaoNeural", "zh-CN-XiaoyiNeural", "zh-CN-YunjianNeural",
    "zh-CN-YunxiNeural", "zh-HK-HiuGaaiNeural", "zh-HK-WanLungNeural",
    "zh-TW-HsiaoChenNeural", "zh-TW-YunJheNeural",
    "zu-ZA-ThandoNeural", "zu-ZA-ThembaNeural",
]


def _catalog_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "tts_voices.json")


def load_voice_catalog() -> list:
    """Static vendored catalog of the edge-tts neural voices (318 entries:
    ShortName/Gender/Locale/FriendlyName), the offline equivalent of the
    reference's rvc/lib/tools/tts_voices.json — the TTS tab's dropdown is
    fully populated without network access."""
    import json

    try:
        with open(_catalog_path(), encoding="utf-8") as f:
            return json.load(f)
    except Exception:
        return [{"ShortName": v, "Gender": "", "Locale": v[:5],
                 "FriendlyName": v} for v in COMMON_VOICES]


def list_voices() -> list:
    """Full voice list: live via edge-tts when it has network, else the
    vendored static catalog (reference parity: the dropdown always shows
    the complete voice set)."""
    try:
        import asyncio

        import edge_tts

        voices = asyncio.run(edge_tts.list_voices())
        return sorted(v["ShortName"] for v in voices)
    except Exception:
        return [v["ShortName"] for v in load_voice_catalog()]
