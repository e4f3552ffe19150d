"""Audio analyzer: spectral statistics + optional plot report.

Parity target: rvc/lib/tools/analyzer.py:1-76 (waveform + spectrogram +
spectral-feature matplotlib report). Stats are computed with our own STFT;
the plot renders only if matplotlib is importable (not baked in every env).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .audio_io import load_audio


def analyze_audio(
    input_path: str, save_plot_path: Optional[str] = None, sr: int = 16000
) -> Tuple[Dict[str, float], Optional[str]]:
    audio = load_audio(input_path, sr)
    n_fft, hop = 1024, 256
    pad = n_fft // 2
    y = np.pad(audio, (pad, pad), mode="reflect")
    n = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    spec = np.abs(np.fft.rfft(y[idx] * win, axis=1))
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)

    power = spec**2
    total = power.sum(axis=1) + 1e-12
    centroid = (power * freqs[None, :]).sum(axis=1) / total
    cumsum = np.cumsum(power, axis=1)
    rolloff_idx = np.argmax(cumsum >= 0.85 * total[:, None], axis=1)
    rolloff = freqs[rolloff_idx]
    bandwidth = np.sqrt(
        (power * (freqs[None, :] - centroid[:, None]) ** 2).sum(axis=1) / total
    )
    zcr = np.mean(np.abs(np.diff(np.signbit(audio).astype(np.int8)))) * sr / 2

    stats = {
        "duration_seconds": len(audio) / sr,
        "rms_db": float(20 * np.log10(np.sqrt(np.mean(audio**2)) + 1e-12)),
        "peak_db": float(20 * np.log10(np.abs(audio).max() + 1e-12)),
        "spectral_centroid_hz": float(np.mean(centroid)),
        "spectral_rolloff_hz": float(np.mean(rolloff)),
        "spectral_bandwidth_hz": float(np.mean(bandwidth)),
        "zero_crossing_rate_hz": float(zcr),
    }

    plot_path = None
    if save_plot_path:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(2, 1, figsize=(12, 6))
            t = np.arange(len(audio)) / sr
            axes[0].plot(t, audio, linewidth=0.4)
            axes[0].set_title("waveform")
            db = 20 * np.log10(spec.T + 1e-6)
            axes[1].imshow(
                db, origin="lower", aspect="auto",
                extent=[0, len(audio) / sr, 0, sr / 2],
            )
            axes[1].set_title("spectrogram (dB)")
            fig.tight_layout()
            fig.savefig(save_plot_path, dpi=120)
            plt.close(fig)
            plot_path = save_plot_path
        except Exception as e:
            print(f"plot skipped ({e})")

    for k, v in stats.items():
        print(f"{k}: {v:.3f}")
    return stats, plot_path
