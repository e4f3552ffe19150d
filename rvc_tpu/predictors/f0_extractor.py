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

# canonical staged-checkpoint locations (reference: rvc/models/predictors/)
DEFAULT_CKPTS = {
    "rmvpe": "models/predictors/rmvpe.pt",
    "fcpe": "models/predictors/fcpe.pt",
    "crepe": "models/predictors/crepe.pt",
}


def interp_f0_to_grid(f0: np.ndarray, n_frames: int) -> np.ndarray:
    """Resample an f0 contour to `n_frames` on the 10 ms grid, treating
    unvoiced (<0.001 Hz) as NaN so interpolation never bridges a voiced
    value across silence (reference pipeline.py:242-259 crepe resize).
    Shared by the inference pipeline and extraction."""
    if len(f0) <= 1:
        return np.asarray(f0, np.float32)
    src = np.asarray(f0, np.float64).copy()
    src[src < 0.001] = np.nan
    tgt = np.interp(
        np.arange(0, len(src) * n_frames, len(src)) / n_frames,
        np.arange(len(src)), src)
    return np.nan_to_num(tgt)


def parse_f0_methods(f0_method: str) -> list:
    """'hybrid[a+b]' -> ['a', 'b']; a plain name -> [name]. The single
    definition of the hybrid syntax (used by converter predictor loading AND
    pipeline dispatch — duplicating it risks the two drifting apart)."""
    if f0_method.startswith("hybrid[") and f0_method.endswith("]"):
        return [m.strip()
                for m in f0_method[len("hybrid["):-1].split("+") if m.strip()]
    return [f0_method]


def _resolve_ckpt(explicit: Optional[str], kind: str) -> Optional[str]:
    """Explicit path if it exists, else the canonical staged path, else None
    (random-init fallback keeps pipelines runnable offline, but loudly)."""
    import os

    for cand in (explicit, DEFAULT_CKPTS.get(kind)):
        if cand and os.path.exists(cand):
            return cand
    print(
        f"WARNING: no {kind} checkpoint found "
        f"(looked for {explicit or DEFAULT_CKPTS.get(kind)}); "
        f"using RANDOM-INIT weights — f0 output will be garbage. "
        f"Run `prerequisites` or stage the file under models/predictors/."
    )
    return None


def build_predictors(
    f0_methods=("rmvpe",),
    rmvpe_ckpt: Optional[str] = None,
    fcpe_ckpt: Optional[str] = None,
    crepe_ckpt: Optional[str] = None,
) -> Dict[str, Callable[[np.ndarray], np.ndarray]]:
    """Instantiate requested predictors as audio->f0 callables. Checkpoint
    paths default to the canonical models/predictors/ locations; a missing
    checkpoint falls back to random init with a loud warning."""
    out: Dict[str, Callable] = {}
    for m in f0_methods:
        if m == "rmvpe":
            from .rmvpe import RMVPE

            ck = _resolve_ckpt(rmvpe_ckpt, "rmvpe")
            mdl = RMVPE.from_torch_checkpoint(ck) if ck else RMVPE()
            out[m] = mdl.infer_from_audio
        elif m == "fcpe":
            from .fcpe import FCPE

            ck = _resolve_ckpt(fcpe_ckpt, "fcpe")
            mdl = FCPE.from_torch_checkpoint(ck) if ck else FCPE()
            out[m] = mdl.compute_f0
        elif m in ("crepe", "crepe-tiny"):
            from .crepe import CREPE

            cap = "tiny" if m.endswith("tiny") else "full"
            ck = _resolve_ckpt(crepe_ckpt, "crepe")
            mdl = CREPE.from_torch_checkpoint(ck, cap) if ck else CREPE(cap)
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

    def to_midi(self, output_path: Optional[str] = None,
                tempo: Optional[float] = None,
                f0: Optional[np.ndarray] = None) -> list:
        """Transcribe the extracted contour to MIDI note segments (and a
        .mid file). Reference surface: torchfcpe models_infer.py:255
        extract_f0_to_midi -> f02midi; tempo estimated from the audio when
        not given."""
        from .f0_midi import f0_to_midi

        if f0 is None:
            f0 = self.extract_f0()
        # f0_to_midi only consults the audio for tempo estimation; skip the
        # decode when the caller fixed the tempo
        audio = load_audio(self.wav_path, SR) if tempo is None else None
        out = output_path or self.wav_path.rsplit(".", 1)[0] + ".mid"
        return f0_to_midi(f0, tempo=tempo, audio=audio, sr=SR,
                          output_path=out)

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
