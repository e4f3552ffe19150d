"""Normalizing flow: stacked mean-only residual coupling layers.

Parity target: rvc/lib/algorithm/residuals.py:93-264 (4x coupling + channel
flip). Forward and reverse are separate traces of the same parameters —
`reverse` is a static argument so jit specializes each direction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import Conv1d, WaveNet


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 3
    gin_channels: int = 256
    mean_only: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: Optional[jax.Array] = None,
        reverse: bool = False,
    ) -> jax.Array:
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g)
        out_ch = half if self.mean_only else 2 * half
        m = Conv1d(
            out_ch,
            1,
            name="post",
            kernel_init_std=0.0,  # zero-init so the flow starts as identity
        )(h) * x_mask
        if not self.mean_only:
            m, logs = jnp.split(m, 2, axis=-1)
        else:
            logs = jnp.zeros_like(m)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling -> channel flip); reverse runs mirrored.

    Kept unrolled: only 4 couplings, and nn.scan(reverse=True) does not
    traverse the stacked parameter axis backwards, which the inverse pass
    requires (each coupling's inner WaveNet is itself scanned)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 3
    n_flows: int = 4
    gin_channels: int = 256

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: Optional[jax.Array] = None,
        reverse: bool = False,
    ) -> jax.Array:
        layers = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x = layer(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)  # channel flip (residuals.py:93-106)
        else:
            for layer in reversed(layers):
                x = jnp.flip(x, axis=-1)
                x = layer(x, x_mask, g=g, reverse=True)
        return x
