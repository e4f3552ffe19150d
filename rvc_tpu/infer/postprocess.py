"""Post-processing audio effects (the pedalboard chain equivalent).

Parity target: the 10-effect post_process chain and its parameter surface in
rvc/infer/infer.py:129-191 (Reverb, PitchShift, Limiter, Gain, Distortion,
Chorus, Bitcrush, Clipping, Compressor, Delay via the pedalboard C++ wheel).
The knob names/defaults match the reference CLI contract (core.py infer
parser); DSP implementations are independent numpy/scipy designs:
Schroeder-style reverb, STFT phase-vocoder pitch shift, simple one-pole
envelope dynamics, modulated-delay chorus.

All effects are [T] float32 in/out at a given sample rate.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps


def gain(audio: np.ndarray, sr: int, gain_db: float = 0.0) -> np.ndarray:
    return (audio * (10.0 ** (gain_db / 20.0))).astype(np.float32)


def distortion(audio: np.ndarray, sr: int, drive_db: float = 25.0) -> np.ndarray:
    """Tanh waveshaper with drive (pedalboard Distortion model)."""
    drive = 10.0 ** (drive_db / 20.0)
    return np.tanh(audio * drive).astype(np.float32)


def clipping(audio: np.ndarray, sr: int, threshold_db: float = -6.0) -> np.ndarray:
    t = 10.0 ** (threshold_db / 20.0)
    return np.clip(audio, -t, t).astype(np.float32)


def bitcrush(audio: np.ndarray, sr: int, bit_depth: int = 8) -> np.ndarray:
    levels = 2 ** int(bit_depth)
    return (np.round(audio * (levels / 2)) / (levels / 2)).astype(np.float32)


def _envelope(audio: np.ndarray, sr: int, attack_ms: float, release_ms: float) -> np.ndarray:
    """Peak envelope follower: exact release decay-max + one-pole attack.

    Release stage is the recurrence r[i] = max(x[i], rel * r[i-1]), computed
    exactly without a per-sample Python loop: within a block,
    r[i] = max_{j<=i} x[j] * rel^(i-j) is a running max in the rel^(-j)
    scaled domain (np.maximum.accumulate), with the previous block's tail
    carried across as a decayed seed. Block size keeps rel^(-i) finite in
    float64. Attack smoothing is then a linear one-pole, so it is a plain
    lfilter. ~1000x faster than the sample loop on minutes-long audio.
    """
    atk = np.exp(-1.0 / max(sr * attack_ms / 1000.0, 1.0))
    rel = np.exp(-1.0 / max(sr * release_ms / 1000.0, 1.0))
    x = np.abs(audio).astype(np.float64)
    n = len(x)
    if n == 0:
        return x.astype(np.float32)
    neg_log_rel = max(-np.log(rel), 1e-12)
    block = int(min(65536, max(64, 600.0 / neg_log_rel)))
    r = np.empty(n, np.float64)
    carry = 0.0
    for s in range(0, n, block):
        e = min(n, s + block)
        xb = x[s:e].copy()
        xb[0] = max(xb[0], carry * rel)
        scale = np.exp(neg_log_rel * np.arange(e - s))  # rel**(-i), bounded
        rb = np.maximum.accumulate(xb * scale) / scale
        r[s:e] = rb
        carry = rb[-1]
    env = sps.lfilter([1.0 - atk], [1.0, -atk], r)
    return env.astype(np.float32)


def compressor(
    audio: np.ndarray, sr: int,
    threshold_db: float = 0.0, ratio: float = 1.0,
    attack_ms: float = 1.0, release_ms: float = 100.0,
) -> np.ndarray:
    if ratio <= 1.0:
        return audio.astype(np.float32)
    env = _envelope(audio, sr, attack_ms, release_ms)
    env_db = 20.0 * np.log10(np.maximum(env, 1e-9))
    over = np.maximum(env_db - threshold_db, 0.0)
    gain_db = -over * (1.0 - 1.0 / ratio)
    return (audio * (10.0 ** (gain_db / 20.0))).astype(np.float32)


def limiter(
    audio: np.ndarray, sr: int,
    threshold_db: float = -6.0, release_s: float = 0.01,
) -> np.ndarray:
    env = _envelope(audio, sr, 0.1, release_s * 1000.0)
    t = 10.0 ** (threshold_db / 20.0)
    g = np.minimum(1.0, t / np.maximum(env, 1e-9))
    return (audio * g).astype(np.float32)


def delay(
    audio: np.ndarray, sr: int,
    seconds: float = 0.5, feedback: float = 0.0, mix: float = 0.5,
) -> np.ndarray:
    d = max(1, int(seconds * sr))
    out = audio.copy()
    buf = np.zeros(len(audio) + d, np.float32)
    buf[: len(audio)] = audio
    wet = np.zeros_like(buf)
    # a few feedback taps (truncate when negligible)
    g = 1.0
    for k in range(1, 8):
        off = d * k
        if off >= len(buf) or g < 1e-3:
            break
        wet[off:] += g * buf[: len(buf) - off]
        g *= feedback
        if feedback <= 0:
            break
    wet = wet[: len(audio)]
    return ((1 - mix) * out + mix * wet).astype(np.float32)


def chorus(
    audio: np.ndarray, sr: int,
    rate_hz: float = 1.0, depth: float = 0.25,
    center_delay_ms: float = 7.0, feedback: float = 0.0, mix: float = 0.5,
) -> np.ndarray:
    n = len(audio)
    t = np.arange(n)
    center = center_delay_ms * sr / 1000.0
    mod = center * (1.0 + depth * np.sin(2 * np.pi * rate_hz * t / sr))
    pos = t - mod
    pos = np.clip(pos, 0, n - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n - 1)
    frac = pos - lo
    wet = audio[lo] * (1 - frac) + audio[hi] * frac
    if feedback > 0:
        # zero-padded delay, NOT np.roll: a circular shift would leak the
        # clip's ending into its first samples (audible click at the start).
        d = int(center)
        fb = np.zeros_like(wet)
        if d <= 0:
            fb = wet
        elif d < n:
            fb[d:] = wet[: n - d]
        wet = wet + feedback * fb
    return ((1 - mix) * audio + mix * wet).astype(np.float32)


def _delayed_recursion(
    x: np.ndarray, d: int, b0: float, b1: float, a1: float
) -> np.ndarray:
    """y[n] = b0*x[n] + b1*x[n-d] + a1*y[n-d], evaluated as the d
    independent interleaved first-order recursions it decomposes into —
    O(N) instead of the O(N*d) a dense (d+1)-tap lfilter costs (minutes on
    long audio for freeverb-size delays; same trick as _envelope)."""
    n = len(x)
    m = -(-n // d)
    xp = np.zeros(m * d, np.float64)
    xp[:n] = x
    y = sps.lfilter([b0, b1], [1.0, -a1], xp.reshape(m, d), axis=0)
    return y.reshape(-1)[:n]


def reverb(
    audio: np.ndarray, sr: int,
    room_size: float = 0.5, damping: float = 0.5,
    wet_gain: float = 0.33, dry_gain: float = 0.4,
    width: float = 1.0, freeze_mode: float = 0.0,
) -> np.ndarray:
    """Schroeder/freeverb-style: 8 damped combs + 4 allpasses (mono)."""
    comb_delays = [1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617]
    allpass_delays = [556, 441, 341, 225]
    scale = sr / 44100.0
    feedback = 0.7 + 0.28 * room_size if freeze_mode < 0.5 else 1.0
    damp = damping * 0.4

    out = np.zeros_like(audio, dtype=np.float64)
    x = audio.astype(np.float64)
    for cd in comb_delays:
        d = max(1, int(cd * scale))
        # damped comb y[n] = x[n-d] + f*(1-damp)*y[n-d] (one-pole folded
        # into the gain), run as d interleaved first-order recursions
        out += _delayed_recursion(x, d, 0.0, 1.0, feedback * (1.0 - damp))
    out /= len(comb_delays)
    for ad in allpass_delays:
        d = max(1, int(ad * scale))
        # allpass y[n] = -0.5 x[n] + x[n-d] + 0.5 y[n-d]
        out = _delayed_recursion(out, d, -0.5, 1.0, 0.5)
    mixed = dry_gain * audio + wet_gain * out.astype(np.float32)
    peak = np.abs(mixed).max()
    if peak > 1.0:
        mixed = mixed / peak
    return mixed.astype(np.float32)


def pitch_shift(audio: np.ndarray, sr: int, semitones: float = 0.0) -> np.ndarray:
    """STFT phase-vocoder shift + resample."""
    if abs(semitones) < 1e-6:
        return audio.astype(np.float32)
    factor = 2.0 ** (semitones / 12.0)
    n_fft, hop = 2048, 512
    f, t, Z = sps.stft(audio, nperseg=n_fft, noverlap=n_fft - hop)
    mag, phase = np.abs(Z), np.angle(Z)
    # time-stretch by 1/factor via phase accumulation
    steps = np.arange(0, Z.shape[1], 1.0 / factor)
    dphi = np.diff(phase, axis=1, prepend=phase[:, :1])
    omega = 2 * np.pi * hop * np.arange(Z.shape[0])[:, None] / n_fft
    dphi_wrapped = np.mod(dphi - omega + np.pi, 2 * np.pi) - np.pi + omega
    lo = np.minimum(np.floor(steps).astype(int), Z.shape[1] - 1)
    acc = np.cumsum(dphi_wrapped[:, lo], axis=1)
    stretched = mag[:, lo] * np.exp(1j * acc)
    _, y = sps.istft(stretched, nperseg=n_fft, noverlap=n_fft - hop)
    # resample back to original length -> pitch shifted
    idx = np.arange(len(audio)) * factor
    idx = np.clip(idx, 0, len(y) - 1)
    loi = np.floor(idx).astype(int)
    hii = np.minimum(loi + 1, len(y) - 1)
    frac = idx - loi
    return (y[loi] * (1 - frac) + y[hii] * frac).astype(np.float32)


EFFECT_ORDER = (
    "reverb", "pitch_shift", "limiter", "gain", "distortion",
    "chorus", "bitcrush", "clipping", "compressor", "delay",
)


def apply_post_process(audio: np.ndarray, sr: int, **kw) -> np.ndarray:
    """Apply enabled effects in the reference's chain order
    (infer.py:129-191). Flags: reverb=True, gain=True, ... with their
    parameter kwargs (reverb_room_size=..., gain_db=..., etc.)."""
    if kw.get("reverb"):
        audio = reverb(
            audio, sr,
            kw.get("reverb_room_size", 0.5), kw.get("reverb_damping", 0.5),
            kw.get("reverb_wet_gain", 0.33), kw.get("reverb_dry_gain", 0.4),
            kw.get("reverb_width", 1.0), kw.get("reverb_freeze_mode", 0.0),
        )
    if kw.get("pitch_shift"):
        audio = pitch_shift(audio, sr, kw.get("pitch_shift_semitones", 0.0))
    if kw.get("limiter"):
        audio = limiter(
            audio, sr, kw.get("limiter_threshold", -6.0),
            kw.get("limiter_release_time", 0.01),
        )
    if kw.get("gain"):
        audio = gain(audio, sr, kw.get("gain_db", 0.0))
    if kw.get("distortion"):
        audio = distortion(audio, sr, kw.get("distortion_gain", 25.0))
    if kw.get("chorus"):
        audio = chorus(
            audio, sr, kw.get("chorus_rate", 1.0), kw.get("chorus_depth", 0.25),
            kw.get("chorus_center_delay", 7.0), kw.get("chorus_feedback", 0.0),
            kw.get("chorus_mix", 0.5),
        )
    if kw.get("bitcrush"):
        audio = bitcrush(audio, sr, kw.get("bitcrush_bit_depth", 8))
    if kw.get("clipping"):
        audio = clipping(audio, sr, kw.get("clipping_threshold", -6.0))
    if kw.get("compressor"):
        audio = compressor(
            audio, sr, kw.get("compressor_threshold", 0.0),
            kw.get("compressor_ratio", 1.0), kw.get("compressor_attack", 1.0),
            kw.get("compressor_release", 100.0),
        )
    if kw.get("delay"):
        audio = delay(
            audio, sr, kw.get("delay_seconds", 0.5),
            kw.get("delay_feedback", 0.0), kw.get("delay_mix", 0.5),
        )
    return audio
