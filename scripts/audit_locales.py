"""Automated audit of the 60 UI locale packs (round-5 VERDICT weak #5).

The packs were completed by scripted merge passes; this audit checks every
pack mechanically for the failure modes a bad scripted translation produces:

  1. key-set parity with en_US (missing / extra keys);
  2. placeholder fidelity: every {name} / {} / %s-style token in the English
     source string must appear verbatim in the translation (a dropped or
     mangled placeholder crashes .format at runtime);
  3. script (writing-system) sanity: for languages with a non-Latin script,
     the fraction of translated values containing at least one character of
     the expected Unicode block — a scripted pass that silently left English
     in place scores ~0 here;
  4. English-identity fraction: values byte-identical to the English source
     (legitimate for proper nouns / short technical terms, suspicious in
     bulk), with an allowlist for strings that are expected to stay
     identical (pure placeholders, "OK", product nouns);
  5. JSON well-formedness + no empty values.

Writes docs/I18N_AUDIT.md and exits nonzero on hard failures (1, 2, 5).
Declared-fallback packs (otq: documented English fallback) are exempt from
3 and 4. Usage: python scripts/audit_locales.py
"""

import json
import os
import re
import sys
import unicodedata
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LANG_DIR = os.path.join(ROOT, "rvc_tpu", "ui", "languages")
OUT_MD = os.path.join(ROOT, "docs", "I18N_AUDIT.md")

# Documented English-fallback packs (docs/ROUND4_STATUS.md §5).
FALLBACK_PACKS = {"otq_OTQ"}

# Expected writing system per language code: a predicate over a codepoint.
# Only languages whose PRIMARY script is reliably non-Latin are checked —
# Latin-script languages can't be distinguished from English mechanically.


def _block(*ranges):
    def pred(ch):
        cp = ord(ch)
        return any(lo <= cp <= hi for lo, hi in ranges)
    return pred


CYRILLIC = _block((0x0400, 0x04FF), (0x0500, 0x052F))
ARABIC = _block((0x0600, 0x06FF), (0x0750, 0x077F))
DEVANAGARI = _block((0x0900, 0x097F))
BENGALI = _block((0x0980, 0x09FF))
GURMUKHI = _block((0x0A00, 0x0A7F))
GUJARATI = _block((0x0A80, 0x0AFF))
TAMIL = _block((0x0B80, 0x0BFF))
TELUGU = _block((0x0C00, 0x0C7F))
KANNADA = _block((0x0C80, 0x0CFF))
MALAYALAM = _block((0x0D00, 0x0D7F))
THAI = _block((0x0E00, 0x0E7F))
CJK = _block((0x4E00, 0x9FFF), (0x3400, 0x4DBF))
HIRAGANA_KATAKANA = _block((0x3040, 0x30FF), (0x4E00, 0x9FFF))
HANGUL = _block((0xAC00, 0xD7AF), (0x1100, 0x11FF))
GREEK = _block((0x0370, 0x03FF))
HEBREW = _block((0x0590, 0x05FF))
GEORGIAN = _block((0x10A0, 0x10FF))
ARMENIAN = _block((0x0530, 0x058F))
ETHIOPIC = _block((0x1200, 0x137F))
MYANMAR = _block((0x1000, 0x109F))
KHMER = _block((0x1780, 0x17FF))
LAO = _block((0x0E80, 0x0EFF))
SINHALA = _block((0x0D80, 0x0DFF))

SCRIPT_EXPECT = {
    "ru": CYRILLIC, "uk": CYRILLIC, "be": CYRILLIC, "bg": CYRILLIC,
    "sr": CYRILLIC, "mk": CYRILLIC, "kk": CYRILLIC, "ky": CYRILLIC,
    "ba": CYRILLIC, "tt": CYRILLIC, "mn": CYRILLIC,
    "ar": ARABIC, "fa": ARABIC, "ur": ARABIC, "ps": ARABIC,
    "hi": DEVANAGARI, "mr": DEVANAGARI, "ne": DEVANAGARI,
    "bn": BENGALI, "pa": GURMUKHI, "gu": GUJARATI, "ta": TAMIL,
    "te": TELUGU, "kn": KANNADA, "ml": MALAYALAM, "si": SINHALA,
    "th": THAI, "lo": LAO, "km": KHMER, "my": MYANMAR,
    "zh": CJK, "wu": CJK, "ja": HIRAGANA_KATAKANA, "ko": HANGUL,
    "el": GREEK, "he": HEBREW, "iw": HEBREW, "ka": GEORGIAN,
    "hy": ARMENIAN, "am": ETHIOPIC,
}

# {name} / {} / {0} placeholders and %s/%d/%(name)s printf tokens.
PLACEHOLDER_RE = re.compile(r"\{[^{}]*\}|%\([^)]+\)[sdif]|%[sdif]")

# English-identical values that are legitimate anywhere.
IDENTITY_OK = re.compile(
    r"^\s*$|^[\d\s.,:;!?%+*/=()\[\]{}<>-]*$|^(OK|TTS|RVC|RMVPE|FCPE|CREPE|"
    r"HiFi-GAN|RefineGAN|MRF|NSF|F0|SR|GPU|TPU|CPU|API|URL|ZIP|CSV|JSON|"
    r"WAV|FLAC|MP3|OGG|M4A|AIFF|Gradio|TensorBoard|Hz|kHz|dB|ms|it/s|"
    r"Edge TTS|HuBERT|ContentVec|faiss|Drive|Hugging ?Face)$",
    re.IGNORECASE,
)


def audit():
    en = json.load(open(os.path.join(LANG_DIR, "en_US.json"),
                        encoding="utf-8"))
    en_keys = set(en)
    rows = []
    hard_failures = []
    for fname in sorted(os.listdir(LANG_DIR)):
        if not fname.endswith(".json") or fname == "en_US.json":
            continue
        pack_name = fname[:-5]
        lang = pack_name.split("_")[0].lower()
        path = os.path.join(LANG_DIR, fname)
        try:
            pack = json.load(open(path, encoding="utf-8"))
        except Exception as e:  # hard failure 5
            hard_failures.append(f"{pack_name}: unparseable JSON ({e})")
            continue

        missing = en_keys - set(pack)
        extra = set(pack) - en_keys
        if missing:
            hard_failures.append(
                f"{pack_name}: {len(missing)} missing keys "
                f"(e.g. {sorted(missing)[:2]})")
        if extra:
            hard_failures.append(
                f"{pack_name}: {len(extra)} extra keys "
                f"(e.g. {sorted(extra)[:2]})")

        empty = [k for k, v in pack.items()
                 if not isinstance(v, str) or not v.strip()]
        if empty:
            hard_failures.append(
                f"{pack_name}: {len(empty)} empty values "
                f"(e.g. {empty[:2]})")

        ph_bad = []
        for k in en_keys & set(pack):
            need = sorted(PLACEHOLDER_RE.findall(en[k]))
            have = sorted(PLACEHOLDER_RE.findall(pack[k]))
            if need != have:
                ph_bad.append(k)
        if ph_bad:
            hard_failures.append(
                f"{pack_name}: {len(ph_bad)} placeholder mismatches "
                f"(e.g. {ph_bad[:2]})")

        keys = sorted(en_keys & set(pack))
        ident = [k for k in keys
                 if pack[k] == en[k] and not IDENTITY_OK.match(en[k])]
        ident_frac = len(ident) / max(len(keys), 1)

        script_frac = None
        pred = SCRIPT_EXPECT.get(lang)
        if pred is not None and pack_name not in FALLBACK_PACKS:
            translated = [k for k in keys if k not in ident]
            n_in_script = sum(
                1 for k in translated if any(pred(ch) for ch in pack[k]))
            script_frac = n_in_script / max(len(translated), 1)

        rows.append({
            "pack": pack_name,
            "keys": len(pack),
            "placeholder_bad": len(ph_bad),
            "identical_en_frac": round(ident_frac, 3),
            "script_frac": (round(script_frac, 3)
                            if script_frac is not None else None),
            "fallback": pack_name in FALLBACK_PACKS,
        })

    warn = []
    for r in rows:
        if r["fallback"]:
            continue
        if r["script_frac"] is not None and r["script_frac"] < 0.90:
            warn.append(f"{r['pack']}: only {r['script_frac']:.0%} of "
                        "translated strings contain the expected script")
        if r["identical_en_frac"] > 0.20:
            warn.append(f"{r['pack']}: {r['identical_en_frac']:.0%} of "
                        "values are byte-identical to English")
    return rows, hard_failures, warn


def main():
    rows, hard, warn = audit()
    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    with open(OUT_MD, "w", encoding="utf-8") as f:
        f.write("# i18n pack audit\n\n")
        f.write("Generated by `scripts/audit_locales.py` (mechanical audit "
                "of the scripted locale merges — key parity, placeholder "
                "fidelity, writing-system sanity, English-identity "
                "fraction; see the script docstring for method).\n\n")
        f.write(f"Packs audited: {len(rows)} (+ en_US source). "
                f"Hard failures: {len(hard)}. Warnings: {len(warn)}.\n\n")
        if hard:
            f.write("## Hard failures\n\n")
            for h in hard:
                f.write(f"- {h}\n")
            f.write("\n")
        if warn:
            f.write("## Warnings\n\n")
            for w in warn:
                f.write(f"- {w}\n")
            f.write("\n")
        f.write("## Per-pack results\n\n")
        f.write("| pack | keys | placeholder mismatches | =en frac | "
                "expected-script frac |\n|---|---|---|---|---|\n")
        for r in rows:
            sf = "n/a (Latin/fallback)" if r["script_frac"] is None \
                else f"{r['script_frac']:.2f}"
            fb = " (declared fallback)" if r["fallback"] else ""
            f.write(f"| {r['pack']}{fb} | {r['keys']} | "
                    f"{r['placeholder_bad']} | "
                    f"{r['identical_en_frac']:.2f} | {sf} |\n")
    print(f"wrote {OUT_MD}: {len(rows)} packs, "
          f"{len(hard)} hard failures, {len(warn)} warnings")
    for h in hard:
        print("FAIL:", h)
    for w in warn:
        print("warn:", w)
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
