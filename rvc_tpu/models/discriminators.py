"""Multi-period + multi-scale GAN discriminator ensemble.

Parity target: rvc/lib/algorithm/discriminators.py:9-148 — one DiscriminatorS
plus DiscriminatorP over periods (2, 3, 5, 7, 11, 17, 23, 37), each returning
per-layer feature maps for the feature-matching loss.

TPU notes: period reshaping is a free layout op; the grouped 1D convs in
DiscriminatorS use feature_group_count, which XLA maps onto the MXU as
block-diagonal matmuls. Waveform inputs are [B, T, 1].
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import Conv1d, leaky_relu, spectral_normalize

PERIODS = (2, 3, 5, 7, 11, 17, 23, 37)

# NOTE (round 4): an im2col matmul lowering for the (k,1) period convs
# (`_convk1_mm`, commit 900921d) was removed here. It was chip-probed
# forward-only, but inside the full differentiated train step its backward
# wedged the TPU at execution (the round-3 `bench_train` kernel fault;
# bisected on-chip round 4 — Pallas fused-MRF exonerated, this lowering
# reproduces the hang). MPD runs only in training, so the plain XLA conv
# below is the production path; history preserves the experiment.


class WNConv2d(nn.Module):
    """Weight-normalized 2D conv on [B, H, W, C] (torch dim-0 norm parity)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_spectral_norm: bool = False  # spectral instead of weight norm

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3),
            (kh, kw, in_ch, self.features),
        )
        if self.use_spectral_norm:
            kernel = spectral_normalize(kernel)
        else:
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(kernel), axis=(0, 1, 2)) + 1e-12
                ),
                (self.features,),
            )
            norm = jnp.sqrt(jnp.sum(
                jnp.square(kernel), axis=(0, 1, 2), keepdims=True) + 1e-12)
            kernel = kernel / norm * g
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class DiscriminatorS(nn.Module):
    """Raw-waveform discriminator with grouped strided convs.

    use_spectral_norm mirrors reference discriminators.py:58-61 (norm_f
    selection threaded from the config's use_spectral_norm flag)."""

    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        sn = self.use_spectral_norm
        specs = [
            # (features, kernel, stride, groups, padding)
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        fmap = []
        for i, (f, k, s, gr, p) in enumerate(specs):
            x = Conv1d(
                f, k, stride=s, groups=gr, padding=p,
                use_weight_norm=not sn, use_spectral_norm=sn,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, use_weight_norm=not sn,
                   use_spectral_norm=sn, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time by `period`, 2D convs over (T/p, p)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, c)

        pad = (self.kernel_size - 1) // 2
        fmap = []
        # the reference applies stride 3 to ALL FIVE convs including the
        # final 1024->1024 (discriminators.py:113-129) — unlike classic
        # HiFi-GAN and unlike this repo's _MMSDPeriod/ResWiseDiscriminatorP,
        # whose own reference files switch to stride 1 at the 5th conv
        for i, f in enumerate((32, 128, 512, 1024, 1024)):
            x = WNConv2d(
                f, (self.kernel_size, 1), strides=(self.stride, 1),
                padding=(pad, 0), use_spectral_norm=self.use_spectral_norm,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(1, (3, 1), strides=(1, 1), padding=(1, 0),
                     use_spectral_norm=self.use_spectral_norm,
                     name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def run_discriminators(discs, y: jax.Array, y_hat: jax.Array):
    """Run each sub-discriminator on real+fake as ONE doubled batch.

    Convs are batch-parallel, so results are identical to separate passes
    (up to fp accumulation order) while the op count halves. Discriminator
    cost on TPU is per-op overhead (~90 small convs/step, each
    launch/relayout-bound at tiny spatial dims), not FLOPs. Shared by MPD
    here and every zoo member in models.custom_discriminators."""
    xy = jnp.concatenate([y, y_hat], axis=0)
    return run_discriminators_doubled(discs, [xy] * len(discs), y.shape[0])


def run_discriminators_doubled(discs, inputs, b: int):
    """Run each sub-discriminator on its own already-doubled [2B, ...] input
    and split real/fake halves. The single place that encodes the
    real-first/fake-second batch convention (see run_discriminators); used
    directly by zoo members whose per-disc inputs differ (e.g. the DWT
    scales of MultiScaleDiscriminator)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for d, inp in zip(discs, inputs):
        out, fmap = d(inp)
        y_d_rs.append(out[:b])
        y_d_gs.append(out[b:])
        fmap_rs.append([f[:b] for f in fmap])
        fmap_gs.append([f[b:] for f in fmap])
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = PERIODS
    use_spectral_norm: bool = False  # reference discriminators.py:23-29

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """y, y_hat: [B, T, 1]. Returns (real_logits, fake_logits, fmaps_r, fmaps_g)."""
        sn = self.use_spectral_norm
        discs = [DiscriminatorS(use_spectral_norm=sn, name="disc_s")] + [
            DiscriminatorP(p, use_spectral_norm=sn, name=f"disc_p{p}")
            for p in self.periods
        ]
        return run_discriminators(discs, y, y_hat)
