"""NSF-HiFi-GAN: the default RVC vocoder.

Parity target: rvc/lib/algorithm/generators/hifigan_nsf.py:14-207. A sine
excitation is generated at the output rate, then injected (via strided
"noise convs" that downsample it to each stage's rate) after every
transposed-conv upsample. Odd upsample rates use the reference's special
padding/output_padding rule (hifigan_nsf.py:111-130).

Gradient checkpointing: wrap with jax.checkpoint at the train-step level
instead of per-module flags (XLA remat handles the policy).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..commons import Conv1d, ConvTranspose1d, ResBlock, leaky_relu
from .sine import SineGenerator


class SourceModuleHnNSF(nn.Module):
    """Sine bank -> single excitation channel via linear merge + tanh."""

    sample_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0
    zero_noise: bool = False

    @nn.compact
    def __call__(self, f0: jax.Array, upsample_factor: int) -> jax.Array:
        sines, _, _ = SineGenerator(
            self.sample_rate,
            self.harmonic_num,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
            zero_noise=self.zero_noise,
            name="l_sin_gen",
        )(f0, upsample_factor)
        merged = nn.Dense(1, name="l_linear")(sines)
        return jnp.tanh(merged)  # [B, T_audio, 1]


class HiFiGANNSFGenerator(nn.Module):
    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int
    sr: int
    harmonic_num: int = 0
    zero_noise: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [B, T_frames, initial_channel]
        f0: jax.Array,                  # [B, T_frames] sample-rate f0 per frame
        g: Optional[jax.Array] = None,  # [B, 1, gin_channels]
    ) -> jax.Array:
        upp = math.prod(self.upsample_rates)
        num_kernels = len(self.resblock_kernel_sizes)

        har_source = SourceModuleHnNSF(
            sample_rate=self.sr, harmonic_num=self.harmonic_num,
            zero_noise=self.zero_noise, name="m_source",
        )(f0, upp)  # [B, T_audio, 1]

        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        n_up = len(self.upsample_rates)
        channels = [self.upsample_initial_channel // (2 ** (i + 1)) for i in range(n_up)]
        # stride of the source-downsampling conv at stage i = product of
        # remaining upsample rates (the source is at full audio rate).
        stride_f0s = [
            math.prod(self.upsample_rates[i + 1 :]) if i + 1 < n_up else 1
            for i in range(n_up)
        ]

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = leaky_relu(x)
            if u % 2 == 0:
                padding = (k - u) // 2
            else:
                padding = u // 2 + u % 2
            x = ConvTranspose1d(
                channels[i],
                k,
                stride=u,
                padding=padding,
                output_padding=u % 2,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"ups_{i}",
            )(x)

            stride = stride_f0s[i]
            nk = 1 if stride == 1 else stride * 2 - stride % 2
            npad = 0 if stride == 1 else (nk - stride) // 2
            noise = Conv1d(
                channels[i],
                nk,
                stride=stride,
                padding=npad,
                name=f"noise_convs_{i}",
            )(har_source)
            x = x + noise

            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                out = ResBlock(channels[i], rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        x = leaky_relu(x, 0.01)  # final activation uses torch's default slope
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)  # [B, T_audio, 1]
