"""DSP fundamental-frequency estimation (no learned weights).

The reference's f0 menu is {crepe, crepe-tiny, rmvpe, fcpe, hybrid[...]}
(rvc/infer/pipeline.py:322-383), all of which need downloaded predictor
checkpoints. This YIN-style estimator provides a weight-free fallback (the
"pm"-class method in BASELINE.json's CPU config) so every pipeline runs with
zero external assets, and it doubles as a test oracle for the learned
predictors' plumbing.

Fully vectorized: frame -> cumulative-mean-normalized difference via FFT
autocorrelation -> thresholded minimum with parabolic interpolation. Jits to
one XLA program; frames batch onto the MXU through the rfft matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import frame_signal


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "hop", "frame", "fmin", "fmax")
)
def yin_f0(
    audio: jax.Array,
    sample_rate: int = 16000,
    hop: int = 160,
    frame: int = 1024,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    threshold: float = 0.15,
) -> jax.Array:
    """audio [T] -> f0 [T//hop + 1] Hz (0 where unvoiced)."""
    pad = frame // 2
    y = jnp.pad(audio[None, :], ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, frame, hop)[0]  # [n_frames, frame]
    n_frames = frames.shape[0]

    tau_max = int(sample_rate / fmin)
    tau_min = max(2, int(sample_rate / fmax))
    w = frame // 2

    # difference function d(tau) = sum_{t<w} (x[t] - x[t+tau])^2, with the
    # cross term restricted to the window: corr[tau] = sum_{t<w} x[t]x[t+tau]
    # = irfft(conj(fft(x[:w])) * fft(x)) — NOT the full autocorrelation.
    x = frames
    xw = x * (jnp.arange(frame) < w)[None, :]
    fft_full = jnp.fft.rfft(x, n=2 * frame, axis=-1)
    fft_win = jnp.fft.rfft(xw, n=2 * frame, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(fft_win) * fft_full, axis=-1)[:, : w + 1]
    cumsq = jnp.cumsum(x**2, axis=-1)
    # energy of x[0:w] and x[tau:tau+w]
    e0 = cumsq[:, w - 1 : w]                                  # [n, 1]
    taus = jnp.arange(w + 1)
    e_tau = cumsq[:, taus + w - 1] - jnp.where(
        taus > 0, cumsq[:, jnp.maximum(taus - 1, 0)], 0.0
    )
    d = jnp.maximum(e0 + e_tau - 2.0 * corr, 0.0)              # [n, w+1]

    # cumulative mean normalized difference
    cum = jnp.cumsum(d[:, 1:], axis=-1)
    tau_idx = jnp.arange(1, w + 1, dtype=jnp.float32)
    cmnd = d[:, 1:] * tau_idx / jnp.maximum(cum, 1e-12)        # [n, w]
    cmnd = jnp.concatenate([jnp.ones((n_frames, 1)), cmnd], axis=-1)

    # search range [tau_min, tau_max]
    rng_mask = (taus >= tau_min) & (taus <= min(tau_max, w))
    masked = jnp.where(rng_mask[None, :], cmnd, jnp.inf)

    # YIN absolute-threshold rule: first tau under threshold, then descend to
    # the local minimum (the crossing happens a few samples before the true
    # period); fall back to the global minimum when nothing crosses.
    under = masked < threshold
    any_under = jnp.any(under, axis=-1)
    first_under = jnp.argmax(under, axis=-1)                   # [n]
    global_min = jnp.argmin(masked, axis=-1)
    # bounded descent: argmin of cmnd within [c, 1.5c] — covers the dip at
    # the true period while excluding the 2T octave dip.
    c = first_under[:, None]
    descent_mask = (taus[None, :] >= c) & (taus[None, :] <= c + c // 2 + 2)
    local_min = jnp.argmin(
        jnp.where(descent_mask & rng_mask[None, :], cmnd, jnp.inf), axis=-1
    )
    tau = jnp.where(any_under, local_min, global_min)          # [n]

    # parabolic interpolation around tau
    tau_c = jnp.clip(tau, 1, w - 1)
    idx = jnp.stack([tau_c - 1, tau_c, tau_c + 1], axis=-1)
    vals = jnp.take_along_axis(cmnd, idx, axis=-1)
    a, b, c = vals[:, 0], vals[:, 1], vals[:, 2]
    denom = a - 2 * b + c
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (a - c) / denom, 0.0)
    tau_f = tau_c.astype(jnp.float32) + jnp.clip(shift, -0.5, 0.5)

    f0 = sample_rate / jnp.maximum(tau_f, 1.0)
    best = jnp.take_along_axis(cmnd, tau[:, None], axis=-1)[:, 0]
    voiced = (best < 0.5) & (f0 >= fmin) & (f0 <= fmax)
    return jnp.where(voiced, f0, 0.0)


def yin_f0_np(audio: np.ndarray, **kw) -> np.ndarray:
    return np.asarray(yin_f0(jnp.asarray(audio, jnp.float32), **kw))
