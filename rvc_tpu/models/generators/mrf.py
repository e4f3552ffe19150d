"""MRF-HiFi-GAN: NSF vocoder with Multi-Receptive-Field refinement blocks.

Parity target: rvc/lib/algorithm/generators/hifigan_mrf.py:13-374. Same NSF
skeleton as the default vocoder but: the harmonic source keeps 8 overtones
(bank merged by a learned linear), f0 is nearest-neighbor upsampled to the
audio rate *before* sine generation, the noise convs take the merged 1-channel
source, and the refinement blocks are sequential dilated skip layers (MRF)
instead of parallel ResBlocks.

Layout: activations are [B, T, C] (NTC) so every 1x1/merge lands on the MXU.
Gradient checkpointing is applied at the train-step level via jax.checkpoint
rather than per-module flags.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..commons import (Conv1d, ConvTranspose1d, leaky_relu,
                       source_downsample_geometry)
from .sine import CumsumSineGenerator


class MRFLayer(nn.Module):
    """Dilated conv -> 1-dilation conv with skip (hifigan_mrf.py:13-54)."""

    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = leaky_relu(x)
        y = Conv1d(
            self.channels,
            self.kernel_size,
            dilation=self.dilation,
            use_weight_norm=True,
            name="conv1",
        )(y)
        y = leaky_relu(y)
        y = Conv1d(
            self.channels,
            self.kernel_size,
            padding=self.kernel_size // 2,
            use_weight_norm=True,
            name="conv2",
        )(y)
        return x + y


class MRFBlock(nn.Module):
    """Sequential MRF layers over a dilation schedule (hifigan_mrf.py:57-84)."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            x = MRFLayer(self.channels, self.kernel_size, d, name=f"layer_{i}")(x)
        return x


class MRFSourceModule(nn.Module):
    """Harmonic-rich sine bank -> single excitation channel.

    Parity: SourceModuleHnNSF in hifigan_mrf.py:180-243 (l_linear has a bias,
    unlike RefineGAN's merge).
    """

    sample_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0
    zero_noise: bool = False

    @nn.compact
    def __call__(self, f0: jax.Array) -> jax.Array:
        """f0: [B, T_audio, 1] -> [B, T_audio, 1] excitation."""
        sines, _, _ = CumsumSineGenerator(
            self.sample_rate,
            self.harmonic_num,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
            zero_noise=self.zero_noise,
            name="l_sin_gen",
        )(f0)
        merged = nn.Dense(1, name="l_linear")(sines)
        return jnp.tanh(merged)


class HiFiGANMRFGenerator(nn.Module):
    in_channel: int
    upsample_initial_channel: int
    upsample_rates: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    resblock_kernel_sizes: Sequence[int]
    resblock_dilations: Sequence[Sequence[int]]
    gin_channels: int
    sample_rate: int
    harmonic_num: int = 8
    zero_noise: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [B, T_frames, in_channel]
        f0: jax.Array,                  # [B, T_frames] frame-rate f0
        g: Optional[jax.Array] = None,  # [B, 1, gin_channels]
    ) -> jax.Array:
        upp = math.prod(self.upsample_rates)
        num_kernels = len(self.resblock_kernel_sizes)
        n_up = len(self.upsample_rates)

        # Nearest-neighbor upsample f0 to audio rate, then sine bank
        # (hifigan_mrf.py:264,344-346 uses torch Upsample default = nearest).
        f0_up = jnp.repeat(f0[..., None], upp, axis=1)  # [B, T_audio, 1]
        har_source = MRFSourceModule(
            sample_rate=self.sample_rate,
            harmonic_num=self.harmonic_num,
            zero_noise=self.zero_noise,
            name="m_source",
        )(f0_up)

        x = Conv1d(
            self.upsample_initial_channel, 7, padding=3,
            use_weight_norm=True, name="conv_pre",
        )(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)


        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            if u % 2 == 0:
                padding = (k - u) // 2
            else:
                padding = u // 2 + u % 2
            x = ConvTranspose1d(
                ch,
                k,
                stride=u,
                padding=padding,
                output_padding=u % 2,
                use_weight_norm=True,
                name=f"ups_{i}",
            )(x)

            stride, nk, npad = source_downsample_geometry(self.upsample_rates, i)
            x = x + Conv1d(
                ch, nk, stride=stride, padding=npad, name=f"noise_convs_{i}"
            )(har_source)

            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                out = MRFBlock(ch, rk, tuple(rd), name=f"mrf_{i}_{j}")(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        x = leaky_relu(x, 0.01)  # final activation: torch default slope
        x = Conv1d(1, 7, padding=3, use_weight_norm=True, name="conv_post")(x)
        return jnp.tanh(x)
