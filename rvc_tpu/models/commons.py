"""Shared model building blocks.

Layout convention: activations are [batch, time, channels] (NTC) so the
channel axis maps onto TPU lanes and 1x1 convs become MXU matmuls.

Behavioral parity notes reference the upstream torch implementation
(rvc/lib/algorithm/commons.py, modules.py) but the code below is an
independent JAX design: segment slicing is vmapped lax.dynamic_slice instead
of a per-sample python loop (reference commons.py:60-103), and weight
normalization is an explicit reparameterization rather than a forward hook.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1

# lax.scan unroll factor for the uniform layer stacks (WaveNet, rel-pos
# transformer). 1 = pure loop (smallest program, fastest compile); higher
# trades compile time for less per-iteration loop bookkeeping. Chip A/B
# (docs/PERFORMANCE.md): unroll=4 changes batch-8 train throughput by 0%
# — the scan bodies dominate, not the loop machinery — so 1 stays the
# default and the knob exists for re-probing on future toolchains.
SCAN_UNROLL = max(1, int(os.environ.get("RVC_TPU_SCAN_UNROLL", "1")))


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, T] float mask (1 inside the sequence)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time slices per batch element.

    x: [B, T, ...]; ids_str: [B] start frames. Static segment_size keeps the
    op jit-compatible (replaces reference commons.py:60-85 python loop).
    """

    def _one(xi, start):
        start = jnp.clip(start, 0, xi.shape[0] - segment_size)
        sizes = (segment_size,) + xi.shape[1:]
        starts = (start,) + (0,) * (xi.ndim - 1)
        return jax.lax.dynamic_slice(xi, starts, sizes)

    return jax.vmap(_one)(x, ids_str)


def rand_slice_segments(
    rng: jax.Array, x: jax.Array, x_lengths: jax.Array, segment_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Random per-sample slice starts (reference commons.py:88-103)."""
    b = x.shape[0]
    ids_str_max = jnp.maximum(x_lengths - segment_size + 1, 1).astype(jnp.float32)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_str_max).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def fused_gate(x: jax.Array, hidden: int) -> jax.Array:
    """tanh(x[..., :H]) * sigmoid(x[..., H:]) — the WaveNet gate.

    XLA fuses this into the producing conv; no hand-written kernel needed
    (reference jit-scripts it manually, commons.py:142-157).
    """
    t = jnp.tanh(x[..., :hidden])
    s = jax.nn.sigmoid(x[..., hidden:])
    return t * s


def source_downsample_geometry(
    upsample_rates: Sequence[int], i: int
) -> Tuple[int, int, int]:
    """(stride, kernel, padding) of the NSF source-downsampling conv at
    decoder stage i. The stride is the product of the *remaining* upsample
    rates (the harmonic source lives at full audio rate); the odd-rate
    kernel rule nk = 2s - s%2, pad = (nk - s)//2 reproduces the reference
    (hifigan_nsf.py:91-117). Shared by the NSF, MRF and RefineGAN decoders
    so the rule cannot silently desynchronize between vocoders."""
    import math

    n_up = len(upsample_rates)
    stride = math.prod(upsample_rates[i + 1 :]) if i + 1 < n_up else 1
    nk = 1 if stride == 1 else stride * 2 - stride % 2
    npad = 0 if stride == 1 else (nk - stride) // 2
    return stride, nk, npad


def _normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def spectral_normalize(kernel: jax.Array, n_iters: int = 8) -> jax.Array:
    """Divide a conv kernel by its largest singular value (torch
    spectral_norm semantics: W reshaped to [out, -1], sigma via power
    iteration, gradient flows through W only — u/v detached).

    Deviation (documented): torch keeps a persistent u buffer updated one
    step per forward; stateless re-iteration from a fixed start is the
    jit-pure equivalent and converges to the same sigma (geometric rate).
    The start is a fixed *pseudo-random* unit vector — an all-constant start
    can be nearly orthogonal to a mean-free dominant singular vector, which
    would stall convergence; a random start has overlap w.h.p. for every
    kernel. n_iters=8 leaves (sigma2/sigma1)^16 of the initial error."""
    out_ch = kernel.shape[-1]
    w = kernel.reshape(-1, out_ch)  # [in*k, out]
    v = jax.random.normal(
        jax.random.PRNGKey(w.shape[0]), (w.shape[0],), kernel.dtype
    )
    v = v / (jnp.linalg.norm(v) + 1e-12)
    for _ in range(n_iters):
        u = w.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = w @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = v @ (w @ u)
    return kernel / (sigma + 1e-12)


def lower_conv1d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
    pad: int = 0,
    groups: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Route a 1D conv ([B, T, Cin] x [K, Cin//g, Cout]) to the fastest
    exact lowering on TPU (no bias). Shared by Conv1d and the
    discriminators' WNConv2d period convs (kernel width 1 == a 1D conv per
    period column). The routing heuristics are chip-measured — see the
    inline notes and docs/PERFORMANCE.md."""
    in_ch = x.shape[-1]
    k, _, features = kernel.shape
    if k == 1 and stride == 1 and groups == 1 and pad == 0:
        # 1x1 conv — conv_general_dilated lowers this as a degenerate
        # K=1 convolution fusion with poor tiling (the NSF final-stage
        # noise conv, 1->C over T_audio, profiled at 5.9 ms/conversion).
        # A broadcast multiply (in_ch == 1) or a plain matmul keeps it
        # in well-tiled elementwise/MXU fusions instead.
        if in_ch == 1:
            return x * kernel[0, 0, :][None, None, :]
        return jnp.einsum("bti,io->bto", x, kernel[0])
    if ((stride > 1 or min(in_ch // groups, features) <= 16)
            and dilation == 1 and k > 1
            and in_ch // groups <= 32
            and x.shape[1] >= 256):
        # Narrow convs — strided (the MSD's 4-wide groups, the NSF
        # source downsamplers with 1 input channel) or stride-1 with a
        # skinny end (generator conv_post 32->1, MSD layer 0 1->16) —
        # lower to <1% MXU utilization in both forward and gradient
        # programs; the exact time-fold reformulation runs them as
        # 128-wide batched matmuls (ops/folded_conv.py).
        from ..ops.folded_conv import folded_conv1d_strided

        return folded_conv1d_strided(x, kernel, stride, pad, groups)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


class Conv1d(nn.Module):
    """1D convolution on [B, T, C] with optional weight normalization.

    kernel param shape: (K, in_ch // groups, out_ch). With weight_norm=True a
    per-output-channel scale `g` is learned and the kernel is normalized over
    (K, in) — matching torch's weight_norm(dim=0) on [out, in, K] weights so
    checkpoints can be converted losslessly.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None  # None -> "same"-style (k*d - d) // 2
    use_bias: bool = True
    use_weight_norm: bool = False
    use_spectral_norm: bool = False  # torch spectral_norm parity
    kernel_init_std: Optional[float] = None  # None -> lecun_normal

    @nn.compact
    def __call__(self, x: jax.Array, return_weights: bool = False):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel_shape = (k, in_ch // self.groups, self.features)
        if self.kernel_init_std is not None:
            kinit = _normal_init(self.kernel_init_std)
        else:
            kinit = nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2)
        kernel = self.param("kernel", kinit, kernel_shape)
        if self.use_spectral_norm:
            kernel = spectral_normalize(kernel)
        elif self.use_weight_norm:
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    kernel.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.sqrt(
                jnp.sum(jnp.square(kernel), axis=(0, 1), keepdims=True) + 1e-12
            )
            kernel = kernel / norm * g[None, None, :]

        if return_weights:
            # effective (norm-folded) weights for externally fused kernels
            # (ops/resblock_pallas.py); x is used only for dtype/shape
            bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                    if self.use_bias else jnp.zeros((self.features,)))
            return kernel, bias

        pad = self.padding
        if pad is None:
            pad = (k * self.dilation - self.dilation) // 2
        # Mixed precision: f32 mask multiplies may promote activations; the
        # conv follows the parameter dtype (bf16 under the train policy).
        x = x.astype(kernel.dtype)
        y = lower_conv1d(x, kernel, self.stride, pad, self.groups,
                         self.dilation)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1D convolution matching torch ConvTranspose1d semantics.

    out_len = (in - 1) * stride - 2 * padding + kernel_size + output_padding.
    kernel param shape: (K, in_ch, out_ch). Weight norm normalizes over
    (K, out) per input channel — torch weight_norm(dim=0) on [in, out, K].
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel_shape = (k, in_ch, self.features)
        if self.kernel_init_std is not None:
            kinit = _normal_init(self.kernel_init_std)
        else:
            kinit = nn.initializers.lecun_normal(in_axis=(0, 2), out_axis=1)
        kernel = self.param("kernel", kinit, kernel_shape)
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(kernel), axis=(0, 2)) + 1e-12
                ),
                (in_ch,),
            )
            norm = jnp.sqrt(
                jnp.sum(jnp.square(kernel), axis=(0, 2), keepdims=True) + 1e-12
            )
            kernel = kernel / norm * g[None, :, None]

        x = x.astype(kernel.dtype)
        s = self.stride
        if s > 1:
            # Polyphase formulation: y_full[i*s + r] = sum_q x[i-q] @ W[r+q*s]
            # — nq = ceil(k/s) full-width MXU matmuls of [T, in] x [in, s*out]
            # instead of an input-dilated conv (XLA lowers the dilated form at
            # a fraction of matmul throughput). Exact same sums.
            b, t, _ = x.shape
            nq = -(-k // s)
            wq = []
            for q in range(nq):
                cols = []
                for r in range(s):
                    m = r + q * s
                    cols.append(
                        kernel[m] if m < k
                        else jnp.zeros_like(kernel[0])
                    )
                wq.append(jnp.concatenate(cols, axis=-1))  # [in, s*out]
            out_i = t + nq - 1
            # accumulate the nq partial sums in f32 and cast ONCE at the end
            # — downcasting each partial to bf16 before the next add would
            # discard the f32 accumulation the matmuls request
            z = 0
            for q in range(nq):
                xq = jnp.pad(x, ((0, 0), (q, nq - 1 - q), (0, 0)))
                z = z + jnp.matmul(
                    xq, wq[q], preferred_element_type=jnp.float32
                )
            z = z.astype(kernel.dtype)
            y_full = z.reshape(b, out_i * s, self.features)
            y_full = y_full[:, : (t - 1) * s + k]
            out_len = (t - 1) * s - 2 * self.padding + k + self.output_padding
            if self.output_padding:
                y_full = jnp.pad(
                    y_full, ((0, 0), (0, self.output_padding), (0, 0))
                )
            y = y_full[:, self.padding : self.padding + out_len]
        else:
            # stride 1: input-dilated conv with a flipped kernel
            pad_l = k - 1 - self.padding
            pad_r = k - 1 - self.padding + self.output_padding
            y = jax.lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=0),
                window_strides=(1,),
                padding=((pad_l, pad_r),),
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class _WaveNetLayer(nn.Module):
    """One uniform WaveNet layer for nn.scan (dilation 1, 2H res+skip)."""

    hidden_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, carry, g_i):
        x, output, x_mask = carry
        h = self.hidden_channels
        x_in = Conv1d(
            2 * h, self.kernel_size, use_weight_norm=True, name="in"
        )(x)
        if g_i is not None:
            x_in = x_in + g_i
        acts = fused_gate(x_in, h)
        res_skip = Conv1d(2 * h, 1, use_weight_norm=True, name="res_skip")(acts)
        x = (x + res_skip[..., :h]) * x_mask
        output = output + res_skip[..., h:]
        return (x, output, x_mask), None


class WaveNet(nn.Module):
    """Non-causal WaveNet stack with gated activations and global conditioning.

    Mirrors reference rvc/lib/algorithm/modules.py:5-109: per layer a dilated
    conv to 2H channels, fused tanh/sigmoid gate (+ per-layer slice of the
    conditioning projection), then a 1x1 producing residual+skip. All convs
    weight-normalized.

    Compile-time design: with dilation_rate == 1 the first n-1 layers are
    uniform, so they run as ONE nn.scan program (params stacked on axis 0
    under "layers"); the final layer (skip-only, H channels) stays separate.
    The rare dilation_rate > 1 case falls back to the unrolled loop.
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, g: Optional[jax.Array] = None
    ) -> jax.Array:
        h = self.hidden_channels
        output = jnp.zeros_like(x)

        g_all = None
        if g is not None and self.gin_channels:
            # One fused 1x1 projection for all layers (2H * n_layers).
            g_all = Conv1d(
                2 * h * self.n_layers, 1, use_weight_norm=True, name="cond_layer"
            )(g)

        n_scan = self.n_layers - 1
        if self.dilation_rate == 1 and n_scan > 0:
            if g_all is not None:
                b, t, _ = g_all.shape
                g_scan = g_all[..., : n_scan * 2 * h]
                g_scan = g_scan.reshape(b, t, n_scan, 2 * h)
                g_scan = jnp.moveaxis(g_scan, 2, 0)  # [L-1, B, T, 2H]
            else:
                g_scan = None
            scan = nn.scan(
                _WaveNetLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=n_scan,
                in_axes=0,
                unroll=SCAN_UNROLL,
            )
            (x, output, _), _ = scan(
                self.hidden_channels, self.kernel_size, name="layers"
            )((x, output, x_mask), g_scan)
        else:
            for i in range(n_scan):
                dilation = self.dilation_rate**i
                x_in = Conv1d(
                    2 * h, self.kernel_size, dilation=dilation,
                    use_weight_norm=True, name=f"in_{i}",
                )(x)
                if g_all is not None:
                    x_in = x_in + g_all[..., i * 2 * h : (i + 1) * 2 * h]
                acts = fused_gate(x_in, h)
                res_skip = Conv1d(
                    2 * h, 1, use_weight_norm=True, name=f"res_skip_{i}"
                )(acts)
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]

        # final layer: skip-only (reference modules.py last res_skip has H out)
        i = self.n_layers - 1
        dilation = self.dilation_rate**i
        x_in = Conv1d(
            2 * h, self.kernel_size, dilation=dilation,
            use_weight_norm=True, name="in_final",
        )(x)
        if g_all is not None:
            x_in = x_in + g_all[..., i * 2 * h : (i + 1) * 2 * h]
        acts = fused_gate(x_in, h)
        res_skip = Conv1d(h, 1, use_weight_norm=True, name="res_skip_final")(acts)
        output = output + res_skip
        return output * x_mask


class ResBlock(nn.Module):
    """HiFi-GAN multi-dilation residual block (reference residuals.py:34-90).

    On TPU, long small-channel signals route through the fused Pallas kernel
    (ops/resblock_pallas.py): the whole 6-conv chain runs in VMEM as folded
    MXU matmuls, one HBM read + one write instead of 12. Disable with
    RVC_TPU_DISABLE_PALLAS_RESBLOCK=1."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    def _weights(self, x):
        """Materialize the chain's (folded weight-norm) conv parameters
        without computing — shared by the fused kernel paths."""
        k1, b1, k2, b2 = [], [], [], []
        for i, d in enumerate(self.dilations):
            w, bb = Conv1d(
                self.channels, self.kernel_size, dilation=d,
                use_weight_norm=True, kernel_init_std=0.01,
                name=f"conv1_{i}",
            )(x, return_weights=True)
            k1.append(w)
            b1.append(bb)
            w, bb = Conv1d(
                self.channels, self.kernel_size, dilation=1,
                use_weight_norm=True, kernel_init_std=0.01,
                name=f"conv2_{i}",
            )(x, return_weights=True)
            k2.append(w)
            b2.append(bb)
        return k1, b1, k2, b2

    @nn.compact
    def __call__(self, x: jax.Array, collect_only: bool = False):
        import os

        if collect_only:
            # stage-level MRF fusion (generators): return this chain's
            # parameters; the caller runs ops.resblock_pallas.fused_mrf
            return self._weights(x)

        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("RVC_TPU_DISABLE_PALLAS_RESBLOCK", "") != "1"
            # AD-safe: fused_resblock carries a custom VJP (direct-conv
            # recompute backward), so training graphs may route through it
            and x.shape[1] >= 16384
            and self.channels <= 256
            and x.shape[-1] == self.channels
            and self.kernel_size % 2 == 1
        )
        if use_pallas:
            k1, b1, k2, b2 = self._weights(x)
            from ..ops.resblock_pallas import fused_resblock

            return fused_resblock(
                x, k1, b1, k2, b2, tuple(self.dilations), slope=LRELU_SLOPE
            )
        for i, d in enumerate(self.dilations):
            residual = x
            y = leaky_relu(x)
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"conv1_{i}",
            )(y)
            y = leaky_relu(y)
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=1,
                use_weight_norm=True,
                kernel_init_std=0.01,
                name=f"conv2_{i}",
            )(y)
            x = y + residual
        return x


def kl_divergence(
    m_p: jax.Array, logs_p: jax.Array, m_q: jax.Array, logs_q: jax.Array
) -> jax.Array:
    """KL(p || q) per element for diagonal gaussians (commons.py:43-57)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl
