"""RefineGAN: sine-excitation encoder-decoder vocoder.

Parity target: rvc/lib/algorithm/generators/refinegan.py:12-416. The latent
("mel") is fused with a sine excitation path: a single-harmonic source is
generated at audio rate, projected (pre_conv) and linearly resized back to the
frame rate, concatenated with the projected latent, then refined through
linear-interpolation upsampling stages. Each stage concatenates a strided-conv
downsample of the raw source and applies a ParallelResBlock whose branches are
sandwiched by AdaIN noise injections.

Layout: [B, T, C] (NTC). Linear resampling uses jax.image.resize which matches
torch F.interpolate(mode="linear", align_corners=False) half-pixel sampling.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..commons import Conv1d, leaky_relu, source_downsample_geometry
from .sine import CumsumSineGenerator


def linear_resize(x: jax.Array, new_t: int) -> jax.Array:
    """Linearly resample [B, T, C] along time (align_corners=False).

    antialias=False matches torch F.interpolate(mode="linear"), which point-
    samples with a fixed 2-tap triangle even when downsampling; the jax
    default (antialias=True) stretches the filter on downsampling and drifts
    ~1e-3 from the reference on the 480x source-branch decimation.
    """
    b, _, c = x.shape
    return jax.image.resize(x, (b, new_t, c), method="linear", antialias=False)


class RefineResBlock(nn.Module):
    """Dilated residual stack, slope 0.2 (refinegan.py:12-86)."""

    channels: int
    kernel_size: int = 7
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            y = leaky_relu(x, self.slope)
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"conv1_{i}",
            )(y)
            y = leaky_relu(y, self.slope)
            y = Conv1d(
                self.channels,
                self.kernel_size,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"conv2_{i}",
            )(y)
            x = x + y
        return x


class AdaIN(nn.Module):
    """Learned-scale gaussian noise injection + LeakyReLU (refinegan.py:87-114)."""

    channels: int
    slope: float = 0.2
    zero_noise: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        if self.zero_noise:
            return leaky_relu(x, self.slope)
        noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        return leaky_relu(x + noise * w[None, None, :], self.slope)


class ParallelResBlock(nn.Module):
    """Input conv then parallel AdaIN/ResBlock/AdaIN branches, averaged
    (refinegan.py:116-175)."""

    out_channels: int
    kernel_sizes: Sequence[int] = (3, 7, 11)
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.2
    zero_noise: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv1d(
            self.out_channels, 7, padding=3, kernel_init_std=0.01, name="input_conv"
        )(x)
        outs = []
        for i, k in enumerate(self.kernel_sizes):
            y = AdaIN(self.out_channels, self.slope, self.zero_noise,
                      name=f"adain1_{i}")(x)
            y = RefineResBlock(
                self.out_channels, k, tuple(self.dilations), self.slope,
                name=f"resblock_{i}",
            )(y)
            y = AdaIN(self.out_channels, self.slope, self.zero_noise,
                      name=f"adain2_{i}")(y)
            outs.append(y)
        return sum(outs) / len(outs)


class RefineGANSource(nn.Module):
    """Single-harmonic sine source with bias-free linear merge + tanh
    (refinegan.py:178-263)."""

    sample_rate: int
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0
    zero_noise: bool = False

    @nn.compact
    def __call__(self, f0: jax.Array) -> jax.Array:
        sines, _, _ = CumsumSineGenerator(
            self.sample_rate,
            0,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
            zero_noise=self.zero_noise,
            name="l_sin_gen",
        )(f0)
        merged = nn.Dense(1, use_bias=False, name="merge")(sines)
        return jnp.tanh(merged)


class RefineGANGenerator(nn.Module):
    sample_rate: int = 44100
    downsample_rates: Sequence[int] = (2, 2, 8, 8)  # kept for config parity; unused
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    slope: float = 0.2
    num_mels: int = 128
    start_channels: int = 16  # kept for config parity; unused
    gin_channels: int = 256
    upsample_initial_channel: int = 512
    zero_noise: bool = False

    @nn.compact
    def __call__(
        self,
        mel: jax.Array,                 # [B, T_frames, num_mels] (the latent)
        f0: jax.Array,                  # [B, T_frames]
        g: Optional[jax.Array] = None,  # [B, 1, gin_channels]
    ) -> jax.Array:
        upp = math.prod(self.upsample_rates)
        t_frames = mel.shape[1]
        n_up = len(self.upsample_rates)
        channels = self.upsample_initial_channel

        f0_up = linear_resize(f0[..., None], t_frames * upp)  # [B, T_audio, 1]
        har_source = RefineGANSource(
            self.sample_rate, zero_noise=self.zero_noise, name="m_source"
        )(f0_up)

        x = Conv1d(
            channels // 2, 7, padding=3, use_weight_norm=True, name="pre_conv"
        )(har_source)
        x = linear_resize(x, t_frames)

        mel = Conv1d(
            channels // 2, 7, padding=3, use_weight_norm=True,
            kernel_init_std=0.01, name="mel_conv",
        )(mel)
        if g is not None and self.gin_channels:
            mel = mel + Conv1d(channels // 2, 1, name="cond")(g)
        x = jnp.concatenate([mel, x], axis=-1)  # [B, T_frames, channels]


        for i, rate in enumerate(self.upsample_rates):
            x = leaky_relu(x, self.slope)
            x = linear_resize(x, x.shape[1] * rate)

            stride, nk, npad = source_downsample_geometry(self.upsample_rates, i)
            down = Conv1d(
                self.upsample_initial_channel // (2 ** (i + 2)),
                nk,
                stride=stride,
                padding=npad,
                use_weight_norm=True,
                name=f"downsample_{i}",
            )(har_source)
            x = jnp.concatenate([x, down], axis=-1)

            x = ParallelResBlock(
                out_channels=channels // 2,
                slope=self.slope,
                zero_noise=self.zero_noise,
                name=f"upsample_conv_{i}",
            )(x)
            channels //= 2

        x = leaky_relu(x, self.slope)
        x = Conv1d(
            1, 7, padding=3, use_bias=False, use_weight_norm=True,
            kernel_init_std=0.01, name="conv_post",
        )(x)
        return jnp.tanh(x)
