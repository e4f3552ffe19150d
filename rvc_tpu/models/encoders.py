"""Text (content-feature) encoder and posterior encoder.

Parity targets: rvc/lib/algorithm/encoders.py:88-209. The prior ("text")
encoder consumes HuBERT features + coarse pitch; the posterior encoder
consumes linear spectrograms during training. PRNG for the posterior sample
is threaded explicitly (flax rng collection "noise").
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attentions import Encoder
from .commons import Conv1d, WaveNet, sequence_mask


class TextEncoder(nn.Module):
    """Content encoder: features + pitch -> prior stats (m_p, logs_p)."""

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    embedding_dim: int  # 768 for v2 HuBERT features, 256 for v1
    use_f0: bool = True

    @nn.compact
    def __call__(
        self,
        phone: jax.Array,            # [B, T, embedding_dim]
        pitch: Optional[jax.Array],  # [B, T] int coarse pitch (256 bins)
        lengths: jax.Array,          # [B]
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = nn.Dense(self.hidden_channels, name="emb_phone")(phone)
        if self.use_f0 and pitch is not None:
            x = x + nn.Embed(256, self.hidden_channels, name="emb_pitch")(pitch)
        x = x * math.sqrt(self.hidden_channels)
        x = jnp.where(x >= 0, x, 0.1 * x)  # LeakyReLU(0.1)

        x_mask = sequence_mask(lengths, x.shape[1])[..., None]  # [B, T, 1]
        x = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            name="encoder",
        )(x, x_mask)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Linear-spec -> posterior latent z with reparameterized sampling."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 256
    zero_noise: bool = False

    @nn.compact
    def __call__(
        self,
        y: jax.Array,          # [B, T, spec_channels]
        y_lengths: jax.Array,  # [B]
        g: Optional[jax.Array] = None,  # [B, 1, gin]
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        y_mask = sequence_mask(y_lengths, y.shape[1])[..., None]
        x = Conv1d(self.hidden_channels, 1, name="pre")(y) * y_mask
        x = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(x, y_mask, g=g)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * y_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if self.zero_noise:
            z = m * y_mask
        else:
            noise = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
            z = (m + noise * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask
