"""The VITS-style voice-conversion synthesizer.

Parity target: rvc/lib/algorithm/synthesizers.py:12-260.
  - training forward: posterior z from the real spectrogram, flow z -> z_p,
    random latent slice decoded by the NSF vocoder;
  - inference: prior sample z_p = m_p + exp(logs_p) * eps * 0.66666, inverse
    flow, decode.

All randomness comes from the flax "noise" rng collection (posterior
sampling, prior sampling, sine-source noise), so runs are reproducible and
a zero-noise debug mode is possible by rng substitution at the call site.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import rand_slice_segments, slice_segments
from .encoders import PosteriorEncoder, TextEncoder
from .flows import ResidualCouplingBlock
from .generators.hifigan import HiFiGANGenerator
from .generators.nsf import HiFiGANNSFGenerator


class Synthesizer(nn.Module):
    spec_channels: int
    segment_size: int  # in latent frames (train segment / hop_length)
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (12, 10, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (24, 20, 4, 4)
    spk_embed_dim: int = 109
    gin_channels: int = 256
    sr: int = 48000
    use_f0: bool = True
    text_enc_hidden_dim: int = 768
    vocoder: str = "HiFi-GAN"
    randomized: bool = True
    # depth knobs (reference hardcodes 16/3; exposed for tiny test/dryrun builds)
    posterior_layers: int = 16
    flow_layers: int = 3
    # debug mode: all stochastic sites (posterior sample, sine phase/additive
    # noise, AdaIN) become deterministic for bitwise numeric diffs; pair with
    # infer(temperature=0.0) to also silence the prior sample.
    zero_noise: bool = False

    def setup(self):
        self.enc_p = TextEncoder(
            self.inter_channels,
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.text_enc_hidden_dim,
            use_f0=self.use_f0,
        )
        self.enc_q = PosteriorEncoder(
            self.inter_channels,
            self.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            n_layers=self.posterior_layers,
            gin_channels=self.gin_channels,
            zero_noise=self.zero_noise,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels,
            self.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            n_layers=self.flow_layers,
            gin_channels=self.gin_channels,
        )
        self.emb_g = nn.Embed(self.spk_embed_dim, self.gin_channels)

        if self.use_f0:
            if self.vocoder == "MRF HiFi-GAN":
                from .generators.mrf import HiFiGANMRFGenerator

                self.dec = HiFiGANMRFGenerator(
                    in_channel=self.inter_channels,
                    upsample_initial_channel=self.upsample_initial_channel,
                    upsample_rates=self.upsample_rates,
                    upsample_kernel_sizes=self.upsample_kernel_sizes,
                    resblock_kernel_sizes=self.resblock_kernel_sizes,
                    resblock_dilations=self.resblock_dilation_sizes,
                    gin_channels=self.gin_channels,
                    sample_rate=self.sr,
                    harmonic_num=8,
                    zero_noise=self.zero_noise,
                )
            elif self.vocoder == "RefineGAN":
                from .generators.refinegan import RefineGANGenerator

                self.dec = RefineGANGenerator(
                    sample_rate=self.sr,
                    downsample_rates=tuple(self.upsample_rates[::-1]),
                    upsample_rates=tuple(self.upsample_rates),
                    start_channels=16,
                    num_mels=self.inter_channels,
                    zero_noise=self.zero_noise,
                )
            else:
                self.dec = HiFiGANNSFGenerator(
                    self.inter_channels,
                    self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes,
                    self.upsample_rates,
                    self.upsample_initial_channel,
                    self.upsample_kernel_sizes,
                    gin_channels=self.gin_channels,
                    sr=self.sr,
                    zero_noise=self.zero_noise,
                )
        else:
            if self.vocoder != "HiFi-GAN":
                raise ValueError(f"{self.vocoder} requires pitch guidance (use_f0)")
            self.dec = HiFiGANGenerator(
                self.inter_channels,
                self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                self.upsample_rates,
                self.upsample_initial_channel,
                self.upsample_kernel_sizes,
                gin_channels=self.gin_channels,
            )

    def __call__(
        self,
        phone: jax.Array,                   # [B, T, text_enc_hidden_dim]
        phone_lengths: jax.Array,           # [B]
        pitch: Optional[jax.Array],         # [B, T] coarse (int) or None
        pitchf: Optional[jax.Array],        # [B, T] float f0 at frame rate
        y: jax.Array,                       # [B, T_spec, spec_channels]
        y_lengths: jax.Array,               # [B]
        ds: jax.Array,                      # [B] speaker ids
        ids_slice: Optional[jax.Array] = None,  # [B] precomputed slice starts
    ):
        """Training forward: returns (o, ids_slice, x_mask, y_mask, vae_tuple).

        When `ids_slice` is given the random slice starts are taken as-is
        (the train step draws them outside the model so the forward pass has
        only float outputs and can sit under jax.vjp); otherwise they are
        drawn from the "noise" rng collection.
        """
        g = self.emb_g(ds)[:, None, :]  # [B, 1, gin]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g)
        z_p = self.flow(z, y_mask, g=g)

        if self.randomized:
            if ids_slice is not None:
                z_slice = slice_segments(z, ids_slice, self.segment_size)
            else:
                rng = self.make_rng("noise")
                z_slice, ids_slice = rand_slice_segments(
                    rng, z, y_lengths, self.segment_size
                )
            if self.use_f0:
                pitchf_slice = slice_segments(pitchf, ids_slice, self.segment_size)
                o = self.dec(z_slice, pitchf_slice, g=g)
            else:
                o = self.dec(z_slice, g=g)
            return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)
        else:
            o = self.dec(z, pitchf, g=g) if self.use_f0 else self.dec(z, g=g)
            return o, None, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(
        self,
        phone: jax.Array,
        phone_lengths: jax.Array,
        pitch: Optional[jax.Array],
        nsff0: Optional[jax.Array],
        sid: jax.Array,
        temperature: float = 0.66666,
        rate: Optional[float] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Inference: prior sample -> inverse flow -> decode. Returns (o, x_mask).

        rate: streaming head-trim (reference synthesizers.py:250-253) — keep
        only the trailing `rate` fraction of latent frames before the inverse
        flow/decode. Static per compile (a python float), so each distinct
        rate is its own XLA program."""
        g = self.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        if self.zero_noise or temperature == 0.0:
            z_p = m_p * x_mask
        else:
            eps = jax.random.normal(self.make_rng("noise"), m_p.shape, m_p.dtype)
            z_p = (m_p + jnp.exp(logs_p) * eps * temperature) * x_mask
        if rate is not None:
            head = int(z_p.shape[1] * (1.0 - float(rate)))
            z_p = z_p[:, head:]
            x_mask = x_mask[:, head:]
            if self.use_f0 and nsff0 is not None:
                nsff0 = nsff0[:, head:]
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        if self.use_f0:
            o = self.dec(z * x_mask, nsff0, g=g)
        else:
            o = self.dec(z * x_mask, g=g)
        return o, x_mask

    @staticmethod
    def from_config(cfg, train: bool = True) -> "Synthesizer":
        """Build from an ExperimentConfig (rvc_tpu.configs)."""
        return Synthesizer(
            spec_channels=cfg.data.spec_channels,
            segment_size=cfg.train.segment_size // cfg.data.hop_length,
            inter_channels=cfg.model.inter_channels,
            hidden_channels=cfg.model.hidden_channels,
            filter_channels=cfg.model.filter_channels,
            n_heads=cfg.model.n_heads,
            n_layers=cfg.model.n_layers,
            kernel_size=cfg.model.kernel_size,
            resblock_kernel_sizes=cfg.model.resblock_kernel_sizes,
            resblock_dilation_sizes=cfg.model.resblock_dilation_sizes,
            upsample_rates=cfg.model.upsample_rates,
            upsample_initial_channel=cfg.model.upsample_initial_channel,
            upsample_kernel_sizes=cfg.model.upsample_kernel_sizes,
            spk_embed_dim=cfg.model.spk_embed_dim,
            gin_channels=cfg.model.gin_channels,
            sr=cfg.data.sample_rate,
            use_f0=cfg.model.use_f0,
            text_enc_hidden_dim=cfg.model.text_enc_hidden_dim,
            vocoder=cfg.model.vocoder,
        )
