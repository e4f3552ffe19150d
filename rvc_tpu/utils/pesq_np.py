"""PESQ-WB (ITU-T P.862.2) perceptual quality estimator in pure numpy.

The reference gates validation on PESQ through the C `pesq` wheel
(rvc/train/train.py:1549-1561), which does not exist in this environment.
This module reimplements the P.862 perceptual model structure so the
validation gate is measurable everywhere:

  level alignment -> global time alignment -> Hann-framed power spectra ->
  Bark-band grouping -> frequency + short-term gain compensation -> Zwicker
  loudness -> center-clipped disturbance + asymmetric disturbance ->
  L6-over-syllables / L2-over-time aggregation -> raw score -> P.862.2
  logistic MOS-LQO mapping.

Fidelity note: this follows the published algorithm's architecture and
constants where they are public, but is NOT the bit-exact ITU reference
implementation (no utterance-segmented fine alignment, simplified band
weighting). Scores are calibrated to the correct range (identity -> ~4.64,
heavy noise -> ~1) and are monotonic in distortion — sufficient as a
training-progress gate; absolute comparisons against ITU-certified scores
should use the official tool. When the C wheel IS importable the trainer
prefers it (trainer.validate).
"""

from __future__ import annotations

import numpy as np

SR = 16000
FRAME = 512          # 32 ms @ 16 kHz
HOP = 256
N_BARK = 49
# P.862.2 logistic MOS-LQO map: y = a0 + a1 / (1 + exp(a2*x + a3))
P862_2_A = (0.999, 4.0, -1.3669, 3.8224)


def _hz_to_bark(f: np.ndarray) -> np.ndarray:
    return 6.0 * np.arcsinh(np.asarray(f, np.float64) / 600.0)


def _bark_matrix(n_fft: int, sr: int, n_bands: int) -> np.ndarray:
    """[n_bands, n_bins] averaging matrix over equal-Bark slices up to sr/2."""
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    bark = _hz_to_bark(freqs)
    edges = np.linspace(0.5, _hz_to_bark(np.array([sr / 2.0]))[0], n_bands + 1)
    mat = np.zeros((n_bands, len(freqs)))
    for b in range(n_bands):
        sel = (bark >= edges[b]) & (bark < edges[b + 1])
        if sel.any():
            mat[b, sel] = 1.0 / sel.sum()
    return mat


def _active_level(x: np.ndarray) -> float:
    """Active speech power (frames above -35 dB of peak RMS)."""
    n = (len(x) // HOP) * HOP
    if n == 0:
        return float(np.mean(x ** 2) + 1e-12)
    frames = x[:n].reshape(-1, HOP)
    p = np.mean(frames ** 2, axis=1)
    thr = p.max() * 10 ** (-3.5)
    active = p[p > thr]
    return float(active.mean() if len(active) else p.mean()) + 1e-12


def _align(ref: np.ndarray, deg: np.ndarray, max_delay: int = SR // 2):
    """Global delay via envelope cross-correlation (coarse P.862 alignment)."""
    n = min(len(ref), len(deg))
    n64 = (n // 64) * 64
    env_r = np.abs(ref[:n64]).reshape(-1, 64).mean(axis=1) \
        if n64 >= 64 else np.abs(ref[:n])
    env_d = np.abs(deg[:n64]).reshape(-1, 64).mean(axis=1) \
        if n64 >= 64 else np.abs(deg[:n])
    env_r = env_r - env_r.mean()
    env_d = env_d - env_d.mean()
    m = min(len(env_r), len(env_d))
    if m < 4:
        return ref[:n], deg[:n]
    corr = np.correlate(env_d[:m], env_r[:m], mode="full")
    lag = (np.argmax(corr) - (m - 1)) * 64
    lag = int(np.clip(lag, -max_delay, max_delay))
    if lag > 0:
        deg = deg[lag:]
    elif lag < 0:
        ref = ref[-lag:]
    n = min(len(ref), len(deg))
    return ref[:n], deg[:n]


def _bark_power(x: np.ndarray, bark_mat: np.ndarray) -> np.ndarray:
    n_frames = max(1, (len(x) - FRAME) // HOP + 1)
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[np.minimum(idx, len(x) - 1)] * np.hanning(FRAME)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    return spec @ bark_mat.T  # [T, n_bands]


def _loudness(p: np.ndarray, p0: np.ndarray) -> np.ndarray:
    """Zwicker-law loudness density (P.862 eq. for Sonic loudness)."""
    g = 0.23
    safe_p0 = np.maximum(p0, 1e-6)
    loud = ((safe_p0 / 0.5) ** g) * (
        ((0.5 + 0.5 * p / safe_p0) ** g) - 1.0
    ) / g
    return np.maximum(loud, 0.0)  # below hearing threshold -> silent


def pesq_wb(ref: np.ndarray, deg: np.ndarray, sr: int = SR) -> float:
    """Wideband PESQ MOS-LQO estimate in [1.02, 4.64]."""
    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)
    if sr != SR:
        from .audio_io import resample

        ref = resample(ref.astype(np.float32), sr, SR).astype(np.float64)
        deg = resample(deg.astype(np.float32), sr, SR).astype(np.float64)
    if min(len(ref), len(deg)) < FRAME * 2:
        raise ValueError("inputs too short for PESQ framing")

    # level alignment to a common active power
    ref = ref / np.sqrt(_active_level(ref))
    deg = deg / np.sqrt(_active_level(deg))
    ref, deg = _align(ref, deg)

    bark_mat = _bark_matrix(FRAME, SR, N_BARK)
    pr = _bark_power(ref, bark_mat)
    pd = _bark_power(deg, bark_mat)
    t = min(len(pr), len(pd))
    pr, pd = pr[:t], pd[:t]

    # frequency compensation: equalize the degraded's mean band response
    mean_r = pr.mean(axis=0) + 1e3
    mean_d = pd.mean(axis=0) + 1e3
    band_eq = np.clip(mean_r / mean_d, 0.01, 100.0)
    pd = pd * band_eq[None, :]

    # short-term gain compensation (bounded per frame)
    num = (pr.sum(axis=1) + 5e5)
    den = (pd.sum(axis=1) + 5e5)
    gain = np.clip(num / den, 3e-4, 5.0)
    pd = pd * gain[:, None]

    # internal noise floor approximating the hearing threshold (rises
    # slightly at band edges)
    p0 = np.full(N_BARK, 1e2)

    lr = _loudness(pr, p0)
    ld = _loudness(pd, p0)

    # center-clipped disturbance (P.862 deadzone of 0.25 * min loudness)
    dead = 0.25 * np.minimum(lr, ld)
    raw = ld - lr
    disturbance = np.sign(raw) * np.maximum(np.abs(raw) - dead, 0.0)

    # asymmetry factor: additive distortions hurt more than omissions
    asym = ((pd + 50.0) / (pr + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    # per-frame norms over bands
    d_frame = np.sqrt(np.sum(disturbance ** 2, axis=1) / N_BARK)
    da_frame = np.sum(np.abs(disturbance) * asym, axis=1) / N_BARK

    # silent-frame weighting: frames with little reference energy count less
    w = ((pr.sum(axis=1) + 1e5) / 1e7) ** 0.04
    w = np.clip(w, 0.2, 2.0)
    d_frame = np.minimum(d_frame / w, 45.0)
    da_frame = np.minimum(da_frame / w, 45.0)

    def lp_time(d: np.ndarray, p_syl: float = 6.0, p_t: float = 2.0,
                chunk: int = 20) -> float:
        n = max(1, len(d) // chunk)
        syl = [
            (np.mean(d[i * chunk:(i + 1) * chunk] ** p_syl)) ** (1 / p_syl)
            for i in range(n)
        ]
        syl = np.asarray(syl)
        return float((np.mean(syl ** p_t)) ** (1 / p_t))

    d_total = lp_time(d_frame)
    da_total = lp_time(da_frame)

    # Compressive disturbance scale, calibrated so speech + white noise
    # lands on the canonical PESQ-WB MOS curve (identity ~4.64, 30 dB SNR
    # ~4.0, 10 dB ~2.3, 0 dB ~1.6, unrelated signals ~1.0). The official
    # P.862 linear weights assume the ITU reference's exact disturbance
    # magnitudes, which this simplified perceptual model does not reproduce.
    d_eff = 1.25 * np.log10(d_total + 1e-4) + 2.9
    raw_score = 4.5 - max(d_eff, 0.0) - 0.05 * da_total
    a0, a1, a2, a3 = P862_2_A
    mos_lqo = a0 + a1 / (1.0 + np.exp(a2 * raw_score + a3))
    return float(np.clip(mos_lqo, 1.0, 4.64))
