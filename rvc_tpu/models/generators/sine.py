"""Harmonic sine excitation source for NSF vocoders.

Parity target: the upsample-grid phase construction of reference
SineGenerator (rvc/lib/algorithm/generators/hifigan.py:115-228): per-frame
phase increments on an upsampling grid, with the per-frame rollover folded
into a wrapped cumulative sum so harmonics stay phase-coherent across frame
boundaries. Everything is expressed as cumsum/mod — XLA lowers the scan-free
cumsum efficiently on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SineGenerator(nn.Module):
    sampling_rate: int
    num_harmonics: int = 0
    sine_amplitude: float = 0.1
    noise_stddev: float = 0.003
    voiced_threshold: float = 0.0
    zero_noise: bool = False  # debug: kill phase/additive noise for numeric diffs

    @nn.compact
    def __call__(self, f0: jax.Array, upsampling_factor: int):
        """f0: [B, L] frame-rate fundamental -> ([B, L*upp, H+1] sines, uv, noise)."""
        b, length = f0.shape
        upp = upsampling_factor
        n_waves = self.num_harmonics + 1
        f0 = f0[..., None]  # [B, L, 1]

        # Per-frame phase on the upsample grid: (f0/sr) * [1..upp].
        grid = jnp.arange(1, upp + 1, dtype=jnp.float32)[None, None, :]
        phase = (f0 / self.sampling_rate) * grid  # [B, L, upp]

        # Cross-frame continuity: wrap each frame's full advance into
        # [-0.5, 0.5], accumulate, and add to subsequent frames.
        frame_adv = jnp.mod(phase[:, :-1, -1:] + 0.5, 1.0) - 0.5  # [B, L-1, 1]
        cum = jnp.mod(jnp.cumsum(frame_adv, axis=1), 1.0)
        phase = phase + jnp.pad(cum, ((0, 0), (1, 0), (0, 0)))

        phase = phase.reshape(b, length * upp, 1)
        harmonic_scale = jnp.arange(1, n_waves + 1, dtype=jnp.float32)[None, None, :]
        phase = phase * harmonic_scale

        if n_waves > 1 and not self.zero_noise:
            # per-sample random harmonic phase (reference SineGen draws
            # rand_ini per batch element — sharing one draw would correlate
            # the excitation across the whole batch)
            rand_phase = jax.random.uniform(self.make_rng("noise"), (b, 1, n_waves))
            rand_phase = rand_phase.at[..., 0].set(0.0)  # fundamental keeps phase 0
            phase = phase + rand_phase

        sine = jnp.sin(2.0 * jnp.pi * phase) * self.sine_amplitude

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)  # [B, L, 1]
        uv = jnp.repeat(uv, upp, axis=1)  # nearest-neighbor upsample

        noise_amp = uv * self.noise_stddev + (1.0 - uv) * (self.sine_amplitude / 3.0)
        if self.zero_noise:
            noise = jnp.zeros_like(sine)
        else:
            noise = noise_amp * jax.random.normal(
                self.make_rng("noise"), sine.shape, sine.dtype
            )
        sine = sine * uv + noise
        return sine, uv, noise


def wrapped_phase_cumsum(rad: jax.Array, frame: int = 1024) -> jax.Array:
    """Numerically stable fractional-phase accumulation: mod(cumsum(rad), 1).

    The reference keeps the running phase bounded with a rollover-shift trick
    (hifigan_mrf.py:147-157); a plain fp32 cumsum over minutes of 48 kHz audio
    would drift by audible fractions of a cycle. Here the sum is blocked:
    cumsum within fixed frames plus a wrapped carry across frames, so every
    partial sum stays O(frame * rad) and precision is uniform in length.

    rad: [B, T, D] per-sample phase increments (cycles). Returns phase in
    [0, 1) of the same shape.
    """
    b, t, d = rad.shape
    pad = (-t) % frame
    if pad:
        rad = jnp.pad(rad, ((0, 0), (0, pad), (0, 0)))
    nf = rad.shape[1] // frame
    blocked = rad.reshape(b, nf, frame, d)
    intra = jnp.cumsum(blocked, axis=2)
    totals = jnp.mod(intra[:, :, -1, :], 1.0)  # [B, nf, D]
    carry = jnp.mod(jnp.cumsum(totals, axis=1), 1.0)
    carry = jnp.pad(carry[:, :-1, :], ((0, 0), (1, 0), (0, 0)))  # exclusive
    phase = jnp.mod(jnp.mod(intra, 1.0) + carry[:, :, None, :], 1.0)
    phase = phase.reshape(b, nf * frame, d)
    return phase[:, :t, :]


class CumsumSineGenerator(nn.Module):
    """Sample-rate sine bank via wrapped phase cumsum.

    Parity target: the cumsum-mod SineGenerator variants used by MRF-HiFi-GAN
    (rvc/lib/algorithm/generators/hifigan_mrf.py:86-175) and RefineGAN
    (refinegan.py:178-263): per-sample phase increments f0/sr accumulated over
    the full waveform, random initial phase per harmonic (fundamental keeps
    phase 0), voiced mask + amplitude-dependent noise.
    """

    sampling_rate: int
    num_harmonics: int = 0
    sine_amplitude: float = 0.1
    noise_stddev: float = 0.003
    voiced_threshold: float = 0.0
    zero_noise: bool = False

    @nn.compact
    def __call__(self, f0: jax.Array):
        """f0: [B, T, 1] sample-rate f0 -> ([B, T, H+1] sines, uv, noise)."""
        n_waves = self.num_harmonics + 1
        harmonic_scale = jnp.arange(1, n_waves + 1, dtype=jnp.float32)[None, None, :]
        f0_bank = f0 * harmonic_scale  # [B, T, H+1]
        rad = jnp.mod(f0_bank / self.sampling_rate, 1.0)

        # Random initial phase per harmonic; fundamental stays at 0
        # (reference hifigan_mrf.py:142-145 adds it to the first sample's rad).
        if not self.zero_noise:
            rand_ini = jax.random.uniform(
                self.make_rng("noise"), (f0.shape[0], 1, n_waves)
            )
            rand_ini = rand_ini.at[..., 0].set(0.0)
            rad = rad.at[:, :1, :].add(rand_ini)

        phase = wrapped_phase_cumsum(rad)
        sine = jnp.sin(2.0 * jnp.pi * phase) * self.sine_amplitude

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)  # [B, T, 1]
        noise_amp = uv * self.noise_stddev + (1.0 - uv) * (self.sine_amplitude / 3.0)
        if self.zero_noise:
            noise = jnp.zeros_like(sine)
        else:
            noise = noise_amp * jax.random.normal(
                self.make_rng("noise"), sine.shape, sine.dtype
            )
        sine = sine * uv + noise
        return sine, uv, noise
