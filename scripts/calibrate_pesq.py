"""Calibrate utils/pesq_np.pesq_wb against the ITU P.862.2 C wheel.

The validation logger records the numpy estimator under `pesq_est` (not
`pesq`) precisely because its agreement with ITU PESQ has not been measured
in this offline environment (VERDICT r2 weak #5). Run this script anywhere
the `pesq` wheel installs (any env with egress: `pip install pesq`):

    python scripts/calibrate_pesq.py

It builds a synthetic degradation corpus spanning the MOS range — additive
white/pink noise at several SNRs, lowpass filtering, quantization, clipping,
small time shifts — scores every pair with both implementations, and reports
Pearson/Spearman correlation, mean bias, and per-condition deltas. Paste the
summary into docs/PERFORMANCE.md §validation when run; ≥0.9 Spearman is the
bar for trusting pesq_est as a relative progress gate.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

SR = 16000


def degradations(ref: np.ndarray, rng: np.random.Generator):
    """Yield (name, degraded) pairs spanning light to severe distortion."""
    n = len(ref)
    for snr in (30.0, 20.0, 10.0, 5.0, 0.0):
        noise = rng.normal(size=n).astype(np.float32)
        g = np.sqrt((ref**2).mean() / (10 ** (snr / 10) * (noise**2).mean()))
        yield f"white_snr{int(snr)}", ref + g * noise
    # pink noise (1/f): cumulative sum of white, normalized
    pink = np.cumsum(rng.normal(size=n)).astype(np.float32)
    pink -= pink.mean()
    for snr in (20.0, 10.0):
        g = np.sqrt((ref**2).mean() / (10 ** (snr / 10) * (pink**2).mean()))
        yield f"pink_snr{int(snr)}", ref + g * pink
    # lowpass via FFT brickwall
    for cut in (6000.0, 3000.0, 1500.0):
        spec = np.fft.rfft(ref)
        freqs = np.fft.rfftfreq(n, 1 / SR)
        spec[freqs > cut] = 0
        yield f"lp{int(cut)}", np.fft.irfft(spec, n).astype(np.float32)
    # bit crush
    for bits in (8, 6, 4):
        q = 2.0 ** (bits - 1)
        yield f"quant{bits}", np.round(ref * q) / q
    # clipping
    for lim in (0.5, 0.2):
        yield f"clip{lim}", np.clip(ref, -lim, lim)
    # small misalignment
    for shift in (16, 64):
        yield f"shift{shift}", np.roll(ref, shift)
    yield "identity", ref.copy()


def main() -> int:
    try:
        from pesq import pesq as pesq_itu
    except ImportError:
        print("the ITU `pesq` wheel is not installed — run this in an "
              "egress-enabled env (`pip install pesq`). Nothing measured.")
        return 1

    from rvc_tpu.utils.pesq_np import pesq_wb

    rng = np.random.default_rng(0)
    # speech-like reference: sum of harmonics with AM + pauses
    t = np.arange(4 * SR) / SR
    f0 = 140 + 40 * np.sin(2 * np.pi * 0.7 * t)
    ref = sum(
        (0.4 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR)
        for k in range(1, 6)
    )
    ref *= 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))  # syllabic AM
    ref[: SR // 4] = 0
    ref[-SR // 4 :] = 0
    ref = (0.3 * ref / np.abs(ref).max()).astype(np.float32)

    rows = []
    for name, deg in degradations(ref, rng):
        itu = float(pesq_itu(SR, ref, deg.astype(np.float32), "wb"))
        est = float(pesq_wb(ref, deg.astype(np.float32)))
        rows.append((name, itu, est))
        print(f"{name:>14}  itu={itu:5.2f}  est={est:5.2f}  d={est-itu:+5.2f}")

    itu = np.array([r[1] for r in rows])
    est = np.array([r[2] for r in rows])
    pearson = float(np.corrcoef(itu, est)[0, 1])
    rk = lambda x: np.argsort(np.argsort(x))
    spearman = float(np.corrcoef(rk(itu), rk(est))[0, 1])
    print(f"\nn={len(rows)}  pearson={pearson:.3f}  spearman={spearman:.3f}  "
          f"bias={float(np.mean(est - itu)):+.3f}  "
          f"mae={float(np.mean(np.abs(est - itu))):.3f}")
    print("paste into docs/PERFORMANCE.md §validation metrics")
    return 0


if __name__ == "__main__":
    sys.exit(main())
