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

        if n_waves > 1:
            rand_phase = jax.random.uniform(self.make_rng("noise"), (1, 1, n_waves))
            rand_phase = rand_phase.at[..., 0].set(0.0)  # fundamental keeps phase 0
            phase = phase + rand_phase

        sine = jnp.sin(2.0 * jnp.pi * phase) * self.sine_amplitude

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)  # [B, L, 1]
        uv = jnp.repeat(uv, upp, axis=1)  # nearest-neighbor upsample

        noise_amp = uv * self.noise_stddev + (1.0 - uv) * (self.sine_amplitude / 3.0)
        noise = noise_amp * jax.random.normal(
            self.make_rng("noise"), sine.shape, sine.dtype
        )
        sine = sine * uv + noise
        return sine, uv, noise
