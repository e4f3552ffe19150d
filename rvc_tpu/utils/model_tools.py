"""Model utilities: blending, info, metadata rewrite.

Parity targets:
  - rvc/train/process/model_blender.py:16-101 (alpha-blend two voice models,
    min-shape handling for emb_g speaker-count mismatch)
  - rvc/train/process/model_information.py:16 (metadata printer)
  - rvc/train/process/change_info.py:5 (metadata rewriter)

Operates on our .npz checkpoints; reference .pth inputs are converted on
load via utils.checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

from .checkpoints import load_checkpoint, load_rvc_pth, save_checkpoint


def _load_any(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    if path.endswith(".pth"):
        params, meta = load_rvc_pth(path)
        return params, meta
    params, meta = load_checkpoint(path)
    return params.get("model", params), meta


def _blend_trees(a: Any, b: Any, alpha: float) -> Any:
    """alpha*a + (1-alpha)*b with min-shape cropping (model_blender.py:69-75:
    emb_g rows differ when speaker counts differ)."""
    if isinstance(a, dict):
        out = {}
        for k in a:
            if k in b:
                out[k] = _blend_trees(a[k], b[k], alpha)
            else:
                out[k] = a[k]
        return out
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.shape != b.shape:
        slices = tuple(slice(0, min(x, y)) for x, y in zip(a.shape, b.shape))
        a = a[slices]
        b = b[slices]
    return (alpha * a + (1.0 - alpha) * b).astype(np.float32)


def model_blender(
    name: str, path_a: str, path_b: str, ratio: float = 0.5,
    output_dir: str = "logs",
) -> str:
    """Blend model A into model B with the given ratio; writes
    `<output_dir>/<name>.npz` and returns the path."""
    params_a, meta_a = _load_any(path_a)
    params_b, meta_b = _load_any(path_b)
    from .blender_gui import normalize_sr

    sr_a = normalize_sr(meta_a.get("sample_rate", meta_a.get("sr")))
    sr_b = normalize_sr(meta_b.get("sample_rate", meta_b.get("sr")))
    # '48k' strings and 48000 ints must compare equal; two *unknown* rates
    # must not silently pass the None == None check
    if sr_a is None or sr_b is None:
        print("model_blender: WARNING — sample-rate metadata missing on "
              f"{'both' if sr_a is None and sr_b is None else 'one'} model(s);"
              " blending without the rate compatibility check")
    elif sr_a != sr_b:
        raise ValueError(
            f"cannot blend models with different sample rates "
            f"({sr_a} vs {sr_b})")
    blended = _blend_trees(params_a, params_b, ratio)
    meta = dict(meta_b)
    meta.update({
        "blended_from": [os.path.basename(path_a), os.path.basename(path_b)],
        "blend_ratio": ratio,
        "name": name,
    })
    out = os.path.join(output_dir, f"{name}.npz")
    save_checkpoint(out, blended, meta)
    return out


def model_information(path: str) -> Dict[str, Any]:
    """Return (and pretty-print) checkpoint metadata."""
    params, meta = _load_any(path)
    n_params = None
    try:
        n_params = int(sum(np.asarray(v).size for v in _leaves(params)))
    except Exception:
        pass
    info = dict(meta)
    if n_params:
        info["parameters"] = n_params
    for k, v in info.items():
        print(f"{k}: {v}")
    return info


def change_model_info(path: str, **updates) -> None:
    """Rewrite metadata fields (author/name/...) in place."""
    params, meta = load_checkpoint(path)
    meta.update(updates)
    save_checkpoint(path, params, meta)


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree
