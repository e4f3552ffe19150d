"""Build a locale pack from a translation table, validating key coverage.

Usage: python scripts/make_locale.py <locale> <table.py>

<table.py> must define ``T``: a dict mapping the exact en_US key strings to
translated values. The script verifies T's key set equals en_US.json's key
set (no missing, no extra), then writes rvc_tpu/ui/languages/<locale>.json
with keys in en_US order. Mirrors the reference's per-language packs
(/root/reference/assets/i18n/languages/) which are fully translated.
"""

import json
import pathlib
import runpy
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
LANG_DIR = ROOT / "rvc_tpu" / "ui" / "languages"


def main() -> None:
    locale, table_path = sys.argv[1], sys.argv[2]
    en = json.loads((LANG_DIR / "en_US.json").read_text(encoding="utf-8"))
    table = runpy.run_path(table_path)["T"]
    missing = [k for k in en if k not in table]
    extra = [k for k in table if k not in en]
    if missing or extra:
        for k in missing:
            print(f"MISSING: {k!r}")
        for k in extra:
            print(f"EXTRA:   {k!r}")
        sys.exit(f"{locale}: {len(missing)} missing, {len(extra)} extra keys")
    untranslated = sum(1 for k in en if table[k] == k and len(k) > 12)
    out = {k: table[k] for k in en}  # en_US key order
    path = LANG_DIR / f"{locale}.json"
    path.write_text(
        json.dumps(out, ensure_ascii=False, indent=1) + "\n", encoding="utf-8"
    )
    print(f"{locale}: wrote {len(out)} keys ({untranslated} left identical)")


if __name__ == "__main__":
    main()
