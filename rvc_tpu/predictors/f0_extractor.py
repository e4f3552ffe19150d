"""Standalone F0 extraction/plot utility + the predictor registry.

Parity target: rvc/lib/predictors/F0Extractor.py:19-104 (dataclass wrapping
crepe/fcpe/rmvpe for UI f0-curve extraction and plotting). The registry also
backs the inference pipeline's f0 dispatch (infer/pipeline.py get_f0).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np

from ..utils.audio_io import load_audio

SR = 16000
HOP = 160


def build_predictors(
    f0_methods=("rmvpe",),
    rmvpe_ckpt: Optional[str] = None,
    fcpe_ckpt: Optional[str] = None,
    crepe_ckpt: Optional[str] = None,
) -> Dict[str, Callable[[np.ndarray], np.ndarray]]:
    """Instantiate requested predictors as audio->f0 callables; checkpoints
    are optional (random-init fallback keeps pipelines runnable offline)."""
    import os

    out: Dict[str, Callable] = {}
    for m in f0_methods:
        if m == "rmvpe":
            from .rmvpe import RMVPE

            mdl = (RMVPE.from_torch_checkpoint(rmvpe_ckpt)
                   if rmvpe_ckpt and os.path.exists(rmvpe_ckpt) else RMVPE())
            out[m] = mdl.infer_from_audio
        elif m == "fcpe":
            from .fcpe import FCPE

            mdl = (FCPE.from_torch_checkpoint(fcpe_ckpt)
                   if fcpe_ckpt and os.path.exists(fcpe_ckpt) else FCPE())
            out[m] = mdl.compute_f0
        elif m in ("crepe", "crepe-tiny"):
            from .crepe import CREPE

            cap = "tiny" if m.endswith("tiny") else "full"
            mdl = (CREPE.from_torch_checkpoint(crepe_ckpt, cap)
                   if crepe_ckpt and os.path.exists(crepe_ckpt) else CREPE(cap))
            out[m] = mdl.predict
        elif m == "yin":
            from .dsp_f0 import yin_f0_np

            out[m] = yin_f0_np
        else:
            raise ValueError(
                f"unknown f0 method {m!r}; expected one of "
                "rmvpe/fcpe/crepe/crepe-tiny/yin")
    return out


@dataclasses.dataclass
class F0Extractor:
    """`sample_rate` is accepted for reference-API compatibility only: the
    reference (F0Extractor.py:28-37) loads at that rate and immediately
    resamples to 16 kHz for every predictor, so we load at 16 kHz directly
    (one resample instead of two). The returned contour's timebase is
    therefore always HOP/SR = 10 ms, which is what `hop_size_ms` reports
    (the reference's `hop_size` property reports hop_length/sample_rate,
    which does not match its own crepe/rmvpe outputs)."""

    wav_path: str
    sample_rate: int = SR
    method: str = "rmvpe"

    @property
    def hop_size_ms(self) -> float:
        return HOP / SR * 1000.0

    def extract_f0(self, predictor: Optional[Callable] = None) -> np.ndarray:
        audio = load_audio(self.wav_path, SR)
        if predictor is None:
            predictor = build_predictors((self.method,))[self.method]
        return np.asarray(predictor(audio))

    def plot_f0(self, f0: Optional[np.ndarray] = None,
                save_path: Optional[str] = None) -> Optional[str]:
        if f0 is None:
            f0 = self.extract_f0()
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            t = np.arange(len(f0)) * self.hop_size_ms / 1000.0
            fig, ax = plt.subplots(figsize=(10, 3))
            voiced = f0 > 0
            ax.plot(t[voiced], f0[voiced], ".", markersize=2)
            ax.set_xlabel("time (s)")
            ax.set_ylabel("f0 (Hz)")
            ax.set_title(f"F0 ({self.method})")
            out = save_path or self.wav_path.rsplit(".", 1)[0] + "_f0.png"
            fig.tight_layout()
            fig.savefig(out, dpi=120)
            plt.close(fig)
            return out
        except Exception as e:
            print(f"f0 plot skipped ({e})")
            return None
