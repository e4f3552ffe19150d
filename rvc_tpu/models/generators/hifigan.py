"""Plain HiFi-GAN generator (no-F0 path).

Parity target: rvc/lib/algorithm/generators/hifigan.py:11-112.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nsf import _resblock_stage
from ..commons import Conv1d, ConvTranspose1d, ResBlock, leaky_relu


class HiFiGANGenerator(nn.Module):
    initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self, x: jax.Array, g: Optional[jax.Array] = None
    ) -> jax.Array:
        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            x = ConvTranspose1d(
                ch,
                k,
                stride=u,
                padding=(k - u) // 2,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"ups_{i}",
            )(x)
            x = _resblock_stage(
                x, ch, self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                lambda ch_, rk, rd, j: ResBlock(
                    ch_, rk, tuple(rd), name=f"resblock_{i}_{j}"
                ),
            )

        x = leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)
