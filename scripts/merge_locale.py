"""Merge a translations JSON (key -> translated value) into a locale pack.

Used by the round-4 batch completion of the partially-translated packs:
    python scripts/merge_locale.py ms_MS /tmp/ms_patch.json
Only keys present in the pack are updated; values identical to the English
pack are the ones expected to be patched. Prints the before/after count of
English-valued keys so the pass is auditable.
"""

import json
import os
import sys

LANG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "rvc_tpu", "ui", "languages")


def main(code: str, patch_path: str) -> None:
    en = json.load(open(os.path.join(LANG_DIR, "en_US.json"),
                        encoding="utf-8"))
    path = os.path.join(LANG_DIR, f"{code}.json")
    pack = json.load(open(path, encoding="utf-8"))
    patch = json.load(open(patch_path, encoding="utf-8"))
    before = sum(1 for k, v in pack.items() if en.get(k) == v)
    unknown = [k for k in patch if k not in pack]
    if unknown:
        raise SystemExit(f"{len(unknown)} patch keys not in pack, e.g. "
                         f"{unknown[:3]}")
    pack.update(patch)
    after = sum(1 for k, v in pack.items() if en.get(k) == v)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(pack, f, ensure_ascii=False, indent=2)
        f.write("\n")
    print(f"{code}: english-valued {before} -> {after} "
          f"({len(patch)} keys patched)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
