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

from .commons import Conv1d, leaky_relu, lower_conv1d, spectral_normalize

PERIODS = (2, 3, 5, 7, 11, 17, 23, 37)

# NOTE (round 4): an im2col matmul lowering for the (k,1) period convs
# (`_convk1_mm`, commit 900921d) was removed here. It was chip-probed
# forward-only, but inside the full differentiated train step its backward
# wedged the TPU at execution (the round-3 `bench_train` kernel fault;
# bisected on-chip round 4 — Pallas fused-MRF exonerated, this lowering
# reproduces the hang). The round-5 `batch1d` lowering below is NOT that
# experiment: it reshapes the period axis into batch and reuses the SAME
# folded-conv/matmul paths (ops/folded_conv.py, commons.lower_conv1d) whose
# backwards have trained safely on-chip since round 2; gated on the same
# on-chip smoke (scripts/smoke_train_chip.py) before it became default.


class WNConv2d(nn.Module):
    """Weight-normalized 2D conv on [B, H, W, C] (torch dim-0 norm parity).

    lowering (only for kernel width 1, i.e. the DiscriminatorP period
    convs, which are 1D convs applied independently per period column):
      - "conv2d": plain XLA NHWC conv (reference-shaped).
      - "batch1d": fold the W (period) axis into batch and route through
        commons.lower_conv1d — the strided time-fold matmul reformulation
        for narrow layers, plain 1D conv for wide ones. Exact same sums.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_spectral_norm: bool = False  # spectral instead of weight norm
    lowering: str = "conv2d"

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
        if kw == 1 and self.strides[1] == 1 and self.padding[1] == 0 \
                and self.lowering in ("batch1d", "batch1d_fold"):
            # (kh, 1) conv == a 1D conv per period column: move W into the
            # batch axis and reuse the 1D lowering zoo. The surrounding
            # transposes cancel between consecutive layers (leaky_relu is
            # elementwise, so XLA folds transpose-leaky-transpose pairs);
            # only the fmap views materialize the [B, H, W, C] layout.
            b, h, w, _ = x.shape
            x1 = x.transpose(0, 2, 1, 3).reshape(b * w, h, in_ch)
            if self.lowering == "batch1d_fold":
                # force the time-fold matmul for EVERY layer (wide ones
                # included): fold = smallest multiple of stride with a
                # >=128-wide contraction, so each layer is D~2 batched
                # 128x128-tiled dots instead of a conv fusion.
                from ..ops.folded_conv import folded_conv1d_strided

                s = self.strides[0]
                fold = max(1, -(-128 // in_ch))
                fold = -(-fold // s) * s
                y1 = folded_conv1d_strided(
                    x1, kernel[:, 0], s, self.padding[0], 1, fold=fold)
            else:
                y1 = lower_conv1d(x1, kernel[:, 0], self.strides[0],
                                  self.padding[0])
            h_out = y1.shape[1]
            y = y1.reshape(b, w, h_out, self.features).transpose(0, 2, 1, 3)
            return y + bias
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
    lowering: str = "conv2d"  # see WNConv2d; probed scripts/probe_mpd_lowering.py

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
                lowering=self.lowering, name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(1, (3, 1), strides=(1, 1), padding=(1, 0),
                     use_spectral_norm=self.use_spectral_norm,
                     lowering=self.lowering, name="conv_post")(x)
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
    lowering: str = "conv2d"  # period-conv lowering, see WNConv2d

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """y, y_hat: [B, T, 1]. Returns (real_logits, fake_logits, fmaps_r, fmaps_g)."""
        sn = self.use_spectral_norm
        discs = [DiscriminatorS(use_spectral_norm=sn, name="disc_s")] + [
            DiscriminatorP(p, use_spectral_norm=sn, lowering=self.lowering,
                           name=f"disc_p{p}")
            for p in self.periods
        ]
        return run_discriminators(discs, y, y_hat)
