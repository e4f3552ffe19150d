"""Generate a deterministic synthetic-speech corpus for end-to-end runs.

The de-facto integration test of the reference is a real training run over
speech audio (rvc/train/train.py:1478-1579). This environment has zero
egress and ships no speech dataset, so this script synthesizes one: a
classical source-filter (Klatt-style) formant synthesizer — Rosenberg
glottal pulses through cascaded second-order formant resonators, with
voiced/unvoiced alternation, plosive bursts, syllable prosody, f0
declination + intonation, jitter/shimmer — i.e. audio with the acoustic
structure the pipeline actually models (harmonic spectra, formant
transitions, silence gaps for the slicer, pitch contours for the f0
extractors). Clearly not human speech, but every stage (slicing, f0,
HuBERT features, GAN training, validation) sees realistically-shaped input.

Usage:
    python scripts/make_speech_dataset.py --out assets/speech_corpus \
        --n 24 --sr 48000
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvc_tpu.utils.audio_io import write_wav

# vowel formant targets (Hz): F1, F2, F3 (Peterson & Barney ballpark)
VOWELS = {
    "a": (730, 1090, 2440),
    "e": (530, 1840, 2480),
    "i": (270, 2290, 3010),
    "o": (570, 840, 2410),
    "u": (300, 870, 2240),
    "ae": (660, 1720, 2410),
    "er": (490, 1350, 1690),
}
# consonants: (kind, params)
#   fric: (center_hz, bw_hz, gain)   plos: (burst_hz, )   nas: (f1,)
CONSONANTS = {
    "s": ("fric", (5500, 3000, 0.5)),
    "sh": ("fric", (3000, 2000, 0.55)),
    "f": ("fric", (7000, 4000, 0.3)),
    "h": ("fric", (1200, 1500, 0.25)),
    "t": ("plos", (4000,)),
    "k": ("plos", (2000,)),
    "p": ("plos", (800,)),
    "m": ("nas", (250,)),
    "n": ("nas", (300,)),
    "l": ("nas", (380,)),
}


def _resonator(x: np.ndarray, f: np.ndarray, bw: float, sr: int) -> np.ndarray:
    """Time-varying 2nd-order resonator. Coefficients change slowly, so
    filter in blocks of 64 samples with frozen coefficients (inaudible
    stepping) instead of a per-sample scalar loop."""
    y = np.zeros_like(x)
    state = np.zeros(2)
    B = 64
    from scipy.signal import lfilter

    for i in range(0, len(x), B):
        j = min(i + B, len(x))
        fm = float(np.mean(f[i:j])) if not np.isscalar(f) else float(f)
        r_ = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * np.clip(fm, 50.0, sr / 2 - 200.0) / sr
        a1_, a2_ = 2 * r_ * np.cos(th), -(r_ * r_)
        b0_ = 1 - a1_ - a2_
        y[i:j], state = lfilter([b0_], [1, -a1_, -a2_], x[i:j], zi=state)
    return y


def _rosenberg(f0: np.ndarray, sr: int, rng) -> np.ndarray:
    """Glottal pulse train for a per-sample f0 track (0 => unvoiced)."""
    phase = np.cumsum(np.maximum(f0, 0.0)) / sr
    frac = phase % 1.0
    # Rosenberg C pulse: rising 0..0.4 of cycle, falling 0.4..0.6
    up, down = 0.4, 0.2
    g = np.where(
        frac < up,
        0.5 * (1 - np.cos(np.pi * frac / up)),
        np.where(
            frac < up + down,
            np.cos(np.pi * (frac - up) / (2 * down)),
            0.0,
        ),
    )
    # differentiate (radiation characteristic) + tiny aspiration
    dg = np.diff(g, prepend=g[:1])
    dg += 0.02 * rng.standard_normal(len(dg))
    return np.where(f0 > 0, dg, 0.0)


def synth_utterance(rng: np.random.Generator, sr: int = 48000,
                    n_syllables: int | None = None) -> np.ndarray:
    """One multi-word utterance of CV(C) syllables with sentence prosody."""
    if n_syllables is None:
        n_syllables = int(rng.integers(6, 14))
    base_f0 = float(rng.uniform(95, 260))  # speaker pitch
    segs = []
    vkeys = list(VOWELS)
    ckeys = list(CONSONANTS)
    for syl in range(n_syllables):
        # word boundary pause every 2-4 syllables
        if syl > 0 and rng.random() < 0.35:
            segs.append(("pause", float(rng.uniform(0.06, 0.22)), None))
        c = ckeys[rng.integers(len(ckeys))]
        v = vkeys[rng.integers(len(vkeys))]
        segs.append((c, float(rng.uniform(0.04, 0.11)), None))
        # syllable position in the sentence drives the f0 contour
        pos = syl / max(1, n_syllables - 1)
        stress = 1.0 + (0.25 if rng.random() < 0.3 else 0.0)
        f0_tgt = base_f0 * (1.25 - 0.35 * pos) * stress  # declination
        segs.append(("v:" + v, float(rng.uniform(0.09, 0.24)), f0_tgt))
    segs.append(("pause", 0.15, None))

    # build per-sample tracks
    total = sum(d for _, d, _ in segs)
    n = int(total * sr)
    f0 = np.zeros(n)
    formants = np.zeros((n, 3))
    source_kind = np.zeros(n, np.int8)  # 0 silence, 1 voiced, 2 fric, 3 burst
    fric_par = np.zeros((n, 3))
    amp = np.zeros(n)

    pos = 0
    prev_form = np.array(VOWELS["a"], float)
    cur_f0 = base_f0
    for name, dur, f0_tgt in segs:
        m = int(dur * sr)
        if m <= 0:
            continue
        sl = slice(pos, min(pos + m, n))
        mm = sl.stop - sl.start
        if name == "pause":
            pass
        elif name.startswith("v:"):
            tgt = np.array(VOWELS[name[2:]], float)
            # formant glide from the previous segment (coarticulation)
            glide = min(mm, int(0.03 * sr))
            ramp = np.ones((mm, 1))
            if glide > 0:
                ramp[:glide, 0] = np.linspace(0, 1, glide)
            formants[sl] = prev_form + (tgt - prev_form) * ramp
            prev_form = tgt
            # f0: glide toward target + micro jitter
            if f0_tgt:
                track = np.linspace(cur_f0, f0_tgt, mm)
                cur_f0 = f0_tgt
            else:
                track = np.full(mm, cur_f0)
            jit = 1 + 0.012 * np.cumsum(rng.standard_normal(mm)) / np.sqrt(mm)
            f0[sl] = track * jit
            source_kind[sl] = 1
            env = np.ones(mm)
            a = min(mm // 3, int(0.02 * sr))
            if a > 0:
                env[:a] = np.linspace(0.2, 1, a)
                env[-a:] = np.linspace(1, 0.3, a)
            amp[sl] = env * rng.uniform(0.7, 1.0)
        else:
            kind, par = CONSONANTS[name]
            if kind == "fric":
                source_kind[sl] = 2
                fric_par[sl] = par
                amp[sl] = np.linspace(0.4, 1.0, mm) * 0.8
            elif kind == "plos":
                source_kind[sl] = 3
                fric_par[sl] = (par[0], 2000.0, 1.0)
                amp[sl] = 0.0
                b = min(mm, int(0.012 * sr))
                amp[sl.start + (mm - b):sl.stop] = 1.0  # closure then burst
            else:  # nasal: voiced with low F1, damped
                tgt = np.array([par[0], 1200.0, 2400.0])
                formants[sl] = tgt
                prev_form = tgt
                f0[sl] = cur_f0
                source_kind[sl] = 1
                amp[sl] = 0.5
        pos += m

    # synthesize source
    voiced = _rosenberg(np.where(source_kind == 1, f0, 0.0), sr, rng)
    noise = rng.standard_normal(n) * 0.5
    out = np.zeros(n)

    vmask = source_kind == 1
    if vmask.any():
        sig = voiced * amp
        y = np.zeros(n)
        for k, bw in enumerate((90.0, 110.0, 170.0)):
            y += _resonator(sig, formants[:, k], bw, sr) / (k + 1.0)
        out += y * vmask
    fmask = (source_kind == 2) | (source_kind == 3)
    if fmask.any():
        sig = noise * amp * fmask
        y = _resonator(sig, fric_par[:, 0], 1800.0, sr)
        out += y * 0.6

    # de-emphasis-ish smoothing + normalize
    from scipy.signal import lfilter

    out = lfilter([1.0], [1.0, -0.97], out)
    peak = np.max(np.abs(out)) + 1e-9
    out = out / peak * 0.6
    # room tone so no segment is digitally silent
    out += 0.0008 * rng.standard_normal(n)
    return out.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/speech_corpus")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    total_s = 0.0
    for i in range(a.n):
        wav = synth_utterance(rng, a.sr)
        total_s += len(wav) / a.sr
        write_wav(os.path.join(a.out, f"utt_{i:03d}.wav"), wav, a.sr,
                  subtype="FLOAT")
    print(f"wrote {a.n} utterances, {total_s:.1f}s total, to {a.out}")


if __name__ == "__main__":
    main()
