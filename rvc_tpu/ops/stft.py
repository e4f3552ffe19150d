"""STFT / spectrogram / mel ops as pure JAX, tuned for TPU.

Numerics mirror the reference torch pipeline:
  - spectrogram: reflect-pad by (n_fft - hop)/2 then non-centered STFT with a
    periodic Hann window and sqrt(re^2 + im^2 + 1e-6) magnitude
    (reference: rvc/train/mel_processing.py:53-94).
  - spec_to_mel: slaney mel filterbank matmul + log clamp 1e-5
    (reference: rvc/train/mel_processing.py:97-122).
  - multi-scale mel windows: centered STFT, log10 mels
    (reference: rvc/train/mel_processing.py:149-234).

Layout convention: waveforms are [B, T]; spectrograms are time-major
[B, frames, bins] so the frequency axis lands on TPU lanes and the mel
projection is a single MXU matmul.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank

MAG_EPS = 1e-6
LOG_CLAMP = 1e-5


@functools.lru_cache(maxsize=None)
def _hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice [B, T] into overlapping frames [B, n_frames, frame_length].

    Built from hop-aligned slices + reshapes: chunk j of every frame
    (samples [j*hop, (j+1)*hop)) is a contiguous, hop-aligned view of y, so
    the forward is pure data movement and — critically — the autodiff
    backward is a handful of pad+add ops. The previous
    conv_general_dilated_patches lowering produced a badly tiled
    convolution whose transpose (the frame-gradient overlap-add in the
    multiscale-mel loss) cost ~30 ms per 4096-window scale per train step
    on v5e; this form costs well under a millisecond each way.
    """
    b, t = y.shape
    n_frames = 1 + (t - frame_length) // hop_length
    n_chunks = -(-frame_length // hop_length)  # ceil: chunks per frame
    t_needed = (n_frames + n_chunks - 1) * hop_length
    if t_needed > t:
        y = jnp.pad(y, ((0, 0), (0, t_needed - t)))
    # chunk j: y[:, j*hop : (j+n_frames)*hop] viewed as [B, n_frames, hop]
    chunks = [
        y[:, j * hop_length : (j + n_frames) * hop_length].reshape(
            b, n_frames, hop_length
        )
        for j in range(n_chunks)
    ]
    frames = jnp.concatenate(chunks, axis=-1)  # [B, n_frames, n_chunks*hop]
    return frames[:, :, :frame_length]


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = False,
    eps: float = MAG_EPS,
) -> jax.Array:
    """Magnitude STFT of [B, T] -> [B, n_frames, n_fft // 2 + 1]."""
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    window = jnp.asarray(_hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = frame_signal(y, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + eps)


def spectrogram(y: jax.Array, n_fft: int, hop_length: int, win_length: int) -> jax.Array:
    """Linear spectrogram with the reference's edge padding.

    Reflect-pads by (n_fft - hop)/2 on both sides then runs a non-centered
    STFT, so T % hop == 0 gives exactly T // hop frames.
    """
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    return stft_magnitude(y, n_fft, hop_length, win_length, center=False)


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Project [B, frames, bins] magnitude onto log-mel [B, frames, n_mels]."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax).T)
    mel = jnp.matmul(spec, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=LOG_CLAMP))


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Log-mel spectrogram [B, frames, n_mels] (reference parity path)."""
    spec = spectrogram(y, n_fft, hop_length, win_length)
    return spec_to_mel(spec, n_fft, n_mels, sample_rate, fmin, fmax)


@dataclass(frozen=True)
class MelSpec:
    """Bundles one STFT/mel configuration; callable on [B, T] waveforms."""

    sample_rate: int
    n_fft: int
    hop_length: int
    win_length: int
    n_mels: int
    fmin: float = 0.0
    fmax: float | None = None

    def linear(self, y: jax.Array) -> jax.Array:
        return spectrogram(y, self.n_fft, self.hop_length, self.win_length)

    def __call__(self, y: jax.Array) -> jax.Array:
        return mel_spectrogram(
            y,
            self.n_fft,
            self.n_mels,
            self.sample_rate,
            self.hop_length,
            self.win_length,
            self.fmin,
            self.fmax,
        )


def multiscale_mel_window(n_mels: int, sample_rate: int) -> int:
    """Window size used by the multi-scale mel loss.

    Matches reference compute_window_length (mel_processing.py:149-154):
    floor power of two of 8 * n_mels / (sr/2) seconds worth of samples.
    """
    window_length = int(8 * n_mels / (sample_rate / 2) * sample_rate)
    return 2 ** (window_length.bit_length() - 1)
