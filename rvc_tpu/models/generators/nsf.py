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

from ..commons import (LRELU_SLOPE, Conv1d, ConvTranspose1d, ResBlock,
                       leaky_relu, source_downsample_geometry)
from .sine import SineGenerator


def _resblock_stage(x, ch, kernel_sizes, dilation_sizes, make_block):
    """One decoder stage tail: mean over the parallel ResBlock chains.

    On TPU, when every chain's folded weights fit VMEM together (the last
    48k stage: C=32), all chains run in ONE fused Pallas pass — the signal
    is read from HBM once instead of once per chain
    (ops/resblock_pallas.fused_mrf). Parameters are identical either way
    (the blocks only materialize their convs in collect mode)."""
    import os

    num_kernels = len(kernel_sizes)
    dil0 = tuple(dilation_sizes[0])
    use_mrf = (
        jax.default_backend() == "tpu"
        and os.environ.get("RVC_TPU_DISABLE_PALLAS_RESBLOCK", "") != "1"
        and x.shape[1] >= 16384
        and x.shape[-1] == ch
        and all(tuple(rd) == dil0 for rd in dilation_sizes)
        and all(rk % 2 == 1 for rk in kernel_sizes)
    )
    if use_mrf:
        from ...ops.resblock_pallas import fused_mrf, mrf_weight_bytes

        # ~16 MB VMEM/core, and the kernel's f32 working set (x0 + chain
        # temporaries + accumulators, ~6 tile-wide f32 buffers) rides on
        # top of the weight bank. The bank is stored at the dot dtype —
        # bf16 on the bf16 serving path, halving its footprint — so gate
        # on the ACTUAL bytes, conservatively: a 7.88 MB f32 bank for the
        # C=128 stage OOMed the 16 MB scoped vmem (observed: 18 MB
        # requested), while every bf16-banked stage (<=3.94 MB) compiles
        # and runs. f32 callers (training/validation) keep the proven
        # per-chain kernels except where the bank is comfortably small.
        wb = mrf_weight_bytes(ch, x.shape[1], kernel_sizes, dil0)
        if x.dtype == jnp.bfloat16:
            wb //= 2
        use_mrf = wb <= 4 * 2 ** 20
    if use_mrf:
        chains = [
            make_block(ch, rk, rd, j)(x, collect_only=True)
            for j, (rk, rd) in enumerate(zip(kernel_sizes, dilation_sizes))
        ]
        return fused_mrf(x, chains, tuple(kernel_sizes), dil0,
                         slope=LRELU_SLOPE)
    xs = None
    for j, (rk, rd) in enumerate(zip(kernel_sizes, dilation_sizes)):
        out = make_block(ch, rk, rd, j)(x)
        xs = out if xs is None else xs + out
    return xs / num_kernels


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

            stride, nk, npad = source_downsample_geometry(self.upsample_rates, i)
            noise = Conv1d(
                channels[i],
                nk,
                stride=stride,
                padding=npad,
                name=f"noise_convs_{i}",
            )(har_source)
            x = x + noise

            x = _resblock_stage(
                x, channels[i], self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                lambda ch, rk, rd, j: ResBlock(
                    ch, rk, tuple(rd), name=f"resblock_{i}_{j}"
                ),
            )

        x = leaky_relu(x, 0.01)  # final activation uses torch's default slope
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)  # [B, T_audio, 1]
