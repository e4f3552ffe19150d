"""Environment / installation checker.

Parity target: assets/installation_checker.py (path sanity) + the Config
device probe (rvc/configs/config.py:20-41), expanded into a full environment
report: backend, devices + memory, key wheel availability, native engine,
compile-cache status.
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Any, Dict

OPTIONAL_WHEELS = (
    "jax", "flax", "optax", "orbax", "chex", "einops", "numpy", "scipy",
    "torch", "transformers", "gradio", "pesq", "tensorboard", "matplotlib",
    "edge_tts", "requests",
)


def check_environment(verbose: bool = True) -> Dict[str, Any]:
    report: Dict[str, Any] = {"python": sys.version.split()[0]}

    if " " in os.path.abspath(os.sep.join(__file__.split(os.sep)[:-3])):
        report["path_warning"] = "repository path contains spaces"

    wheels = {}
    for name in OPTIONAL_WHEELS:
        try:
            mod = importlib.import_module(name)
            wheels[name] = getattr(mod, "__version__", "present")
        except Exception:
            wheels[name] = None
    report["wheels"] = wheels

    try:
        import jax

        devices = jax.devices()
        report["backend"] = devices[0].platform if devices else "none"
        report["devices"] = [str(d) for d in devices]
        mems = {}
        for d in devices:
            try:
                s = d.memory_stats() or {}
                if "bytes_limit" in s:
                    mems[str(d)] = round(s["bytes_limit"] / 2**30, 1)
            except Exception:
                pass
        if mems:
            report["device_memory_gb"] = mems
    except Exception as e:
        report["backend_error"] = str(e)

    from . import native

    report["native_audio_engine"] = native.available()
    # the CLI's actual cache location (cli.py _enable_compile_cache)
    cache_dir = os.environ.get(
        "RVC_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rvc_tpu", "xla"))
    report["compile_cache"] = os.path.isdir(cache_dir)

    if verbose:
        for k, v in report.items():
            if k == "wheels":
                present = [n for n, ver in v.items() if ver]
                missing = [n for n, ver in v.items() if not ver]
                print(f"wheels present: {', '.join(present)}")
                if missing:
                    print(f"wheels missing: {', '.join(missing)}")
            else:
                print(f"{k}: {v}")
    return report


if __name__ == "__main__":
    check_environment()
