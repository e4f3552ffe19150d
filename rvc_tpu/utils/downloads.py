"""Model / prerequisite downloads.

Parity target: rvc/lib/tools/prerequisites_download.py (HF pretrains,
rmvpe.pt, fcpe.pt, contentvec) and model_download.py (GDrive/HF/zip link
handling). In zero-egress environments every network fetch degrades to a
clear message; local file paths and file:// URLs still work (copy/unzip).
"""

from __future__ import annotations

import os
import shutil
import zipfile
from urllib.parse import urlparse

PREDICTORS = ("rmvpe.pt", "fcpe.pt")
EMBEDDERS = ("contentvec",)
PRETRAINED_SR = (32000, 40000, 48000)

MODELS_DIR = os.path.join("models")

# public asset locations (reference prerequisites_download.py:6-28)
_URL_BASE = "https://huggingface.co/IAHispano/Applio/resolve/main/Resources"
_ASSET_URLS = {
    os.path.join("predictors", "rmvpe.pt"): f"{_URL_BASE}/predictors/rmvpe.pt",
    os.path.join("predictors", "fcpe.pt"): (
        "https://huggingface.co/Codename0/codename-rvc-fork-3-assets"
        "/resolve/main/models/predictors/fcpe"
    ),
}
_ASSET_URLS.update({
    os.path.join("pretraineds", f"{pfx}{sr // 1000}k.pth"):
        f"{_URL_BASE}/pretrained_v2/{pfx}{sr // 1000}k.pth"
    for sr in PRETRAINED_SR for pfx in ("f0G", "f0D")
})


def prerequisites_download_pipeline(
    pretraineds_hifigan: bool = True, models: bool = True, exe: bool = True
) -> None:
    """Fetch predictor + pretrain assets (reference pulls from HF,
    prerequisites_download.py:6-39). Offline: report what is missing and
    where to place it. `exe` (reference: ffmpeg.exe) here builds the
    native audio engine."""
    os.makedirs(os.path.join(MODELS_DIR, "predictors"), exist_ok=True)
    os.makedirs(os.path.join(MODELS_DIR, "pretraineds"), exist_ok=True)
    if exe:
        # build the native audio engine (needs only g++)
        from . import native

        if native.available():
            print("native audio engine ready")
    missing = []
    if models:
        for name in PREDICTORS:
            path = os.path.join(MODELS_DIR, "predictors", name)
            if not os.path.exists(path):
                missing.append(path)
    if pretraineds_hifigan:
        for sr in PRETRAINED_SR:
            for pfx in ("f0G", "f0D"):
                path = os.path.join(
                    MODELS_DIR, "pretraineds", f"{pfx}{sr // 1000}k.pth"
                )
                if not os.path.exists(path):
                    missing.append(path)
    if not missing:
        print("all prerequisites present")
        return
    failed = []
    for path in missing:
        rel = os.path.relpath(path, MODELS_DIR)
        url = _ASSET_URLS.get(rel)
        if url is None:
            failed.append(path)
            continue
        try:
            import requests

            r = requests.get(url, stream=True, timeout=60)
            r.raise_for_status()
            tmp = path + ".part"
            with open(tmp, "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
            os.replace(tmp, path)
            print(f"downloaded {path}")
        except Exception as e:
            failed.append(path)
            print(f"fetch failed for {path} ({e})")
    if failed:
        print("could not download everything. Place these files manually:")
        for m in failed:
            print(f"  {m}")
        print("Torch checkpoints are converted on load "
              "(rvc_tpu.utils.checkpoints / predictors.rmvpe).")


def install_model_archive(path: str, output_dir: str = "logs") -> str:
    """Install a dropped model file (zip of pth+index, bare .pth/.npz) into
    logs/ (reference tabs/download drag-drop install). Returns the installed
    destination path."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    os.makedirs(output_dir, exist_ok=True)
    if path.endswith(".zip"):
        name = os.path.splitext(os.path.basename(path))[0]
        dest = os.path.join(output_dir, name)
        with zipfile.ZipFile(path) as z:
            z.extractall(dest)
        return dest
    if path.endswith((".pth", ".npz", ".index")):
        dest = os.path.join(output_dir, os.path.basename(path))
        shutil.copy2(path, dest)
        return dest
    raise ValueError(f"unsupported model file {path!r} (.zip/.pth/.npz)")


def model_download_pipeline(
    model_link: str, output_dir: str = "logs", http_get=None
) -> str:
    """Install a model from a link/path (reference
    model_download.py:160-196). Supports local paths, file:// URLs, Google
    Drive share links (confirm-token dance), HF /blob//resolve//tree links,
    and .zip archives; network URLs need egress. `http_get` is an
    injectable transport for tests."""
    parsed = urlparse(model_link)
    local = parsed.path if parsed.scheme in ("", "file") else None
    os.makedirs(output_dir, exist_ok=True)

    if local and os.path.exists(local):
        dest = install_model_archive(local, output_dir)
        print(f"installed {dest}")
        return dest

    from .link_resolver import download_link

    try:
        path = download_link(model_link, output_dir, http_get=http_get)
    except Exception as e:
        raise RuntimeError(
            f"download failed ({e}); in offline environments pass a local "
            "path or file:// URL"
        )
    if path.endswith(".zip"):
        out = path[:-4]
        with zipfile.ZipFile(path) as z:
            z.extractall(out)
        os.remove(path)
        # drop mac resource-fork dirs like the reference's cleaner
        mac = os.path.join(out, "__MACOSX")
        if os.path.isdir(mac):
            shutil.rmtree(mac)
        return out
    return path
