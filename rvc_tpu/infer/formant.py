"""Formant shifting (stftpitchshift equivalent).

Parity target: the reference shifts formants on the input audio via the
stftpitchshift C++ tool with quefrency/timbre knobs
(rvc/lib/utils.py:53-85). Here: cepstral envelope/excitation decomposition —
lifter the log-magnitude at the given quefrency cutoff, warp the envelope's
frequency axis by the timbre factor, recombine with the original excitation
and phases.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps


def formant_shift(
    audio: np.ndarray,
    sr: int,
    quefrency_ms: float = 1.0,
    timbre: float = 1.0,
    n_fft: int = 1024,
) -> np.ndarray:
    """Warp the spectral envelope by `timbre`: env'(f) = env(f / timbre),
    so timbre > 1 stretches the envelope toward higher frequencies (formants
    move UP, a brighter/younger timbre) — the same direction as the
    stftpitchshift timbre quotient the reference shells out to."""
    if abs(timbre - 1.0) < 1e-6:
        return audio.astype(np.float32)
    hop = n_fft // 4
    f, t, Z = sps.stft(audio, sr, nperseg=n_fft, noverlap=n_fft - hop)
    mag = np.maximum(np.abs(Z), 1e-10)
    phase = np.angle(Z)

    logm = np.log(mag)
    ceps = np.fft.irfft(logm, axis=0)
    cutoff = max(1, int(quefrency_ms * 1e-3 * sr))
    n_q = ceps.shape[0]
    lifter = np.zeros((n_q, 1))
    lifter[:cutoff] = 1.0
    if cutoff > 1:  # cutoff==1: `[-0:]` would select ALL bins, not none
        lifter[-(cutoff - 1):] = 1.0  # symmetric low-quefrency window
    env_log = np.fft.rfft(ceps * lifter, axis=0).real       # smooth envelope
    exc_log = logm - env_log                                 # excitation

    # warp envelope bins: env'(f) = env(f / timbre)
    n_bins = env_log.shape[0]
    src = np.arange(n_bins) / timbre
    lo = np.clip(np.floor(src).astype(int), 0, n_bins - 1)
    hi = np.clip(lo + 1, 0, n_bins - 1)
    frac = (src - lo)[:, None]
    env_warp = env_log[lo] * (1 - frac) + env_log[hi] * frac

    new_mag = np.exp(env_warp + exc_log)
    _, y = sps.istft(new_mag * np.exp(1j * phase), sr, nperseg=n_fft,
                     noverlap=n_fft - hop)
    y = y[: len(audio)]
    if len(y) < len(audio):
        y = np.pad(y, (0, len(audio) - len(y)))
    return y.astype(np.float32)
