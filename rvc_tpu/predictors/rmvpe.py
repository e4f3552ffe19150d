"""RMVPE pitch estimator in flax (DeepUnet + BiGRU salience model).

Parity target: rvc/lib/predictors/RMVPE.py (E2E(4, 1, (2,2)): 5-layer
encoder / 4 intermediate / 5-layer decoder U-net over a [T, 128] log-mel
image, 3-channel head, BiGRU(384->2x256), Linear->360 sigmoid salience;
mel front 128 mels @16k win 1024 hop 160 fmin 30 fmax 8000 htk; frames
padded to a multiple of 32; local-average-cents decode with threshold and
f0 = 10 * 2^(cents/1200)).

TPU design: NHWC layout ([B, T, mel, C]) so convs tile onto the MXU; the
BiGRU runs as two lax.scan passes (flax nn.RNN); decode is a vectorized
9-tap gather instead of the reference's per-frame python loop
(RMVPE.py:484-505). Inference is fully jitted per padded length bucket.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import mel_filterbank
from ..ops.stft import stft_magnitude
from .bucketing import bucket_samples as _bucket_samples
from .bucketing import reflect_to as _reflect_to

N_MELS = 128
N_CLASS = 360
SR = 16000
WIN = 1024
HOP = 160


class Conv3x3(nn.Module):
    """3x3 same-padded 2D conv, parameter-identical to
    nn.Conv(out, (3,3), padding=1, use_bias=False) (kernel [3,3,Ci,Co]).

    When the contraction is wide enough (Ci >= MM_MIN_CH), computes the conv
    as 9 shifted [B*H*W, Ci] @ [Ci, Co] matmuls accumulated in f32 instead
    of lax.conv: the UNet's deep levels run at tiny spatial extents
    (T/32 x 4 at C=512) where XLA's conv tiling leaves the MXU idle, while
    the reformulation keeps full 128-lane contractions regardless of the
    spatial shape. Identical sums to the conv (f32 accumulation both ways).
    """

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3),
            (3, 3, in_ch, self.out_channels),
        )
        if in_ch < MM_MIN_CH:
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        k = kernel.astype(x.dtype)
        acc = None
        for dt in range(3):
            for df in range(3):
                xs = jax.lax.slice(
                    xp, (0, dt, df, 0), (xp.shape[0], dt + h, df + w, in_ch))
                term = jnp.einsum(
                    "bhwi,io->bhwo", xs, k[dt, df],
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
        return acc.astype(x.dtype)


# shifted-matmul threshold: contraction width (input channels) at which
# Conv3x3 leaves lax.conv for the 9-matmul form. Chip-probed in
# scripts/probe_rmvpe_conv.py; 10**9 disables it.
MM_MIN_CH = int(os.environ.get("RVC_TPU_RMVPE_MM_MIN_CH", "64"))
# same idea for the decoder's 2x ConvTranspose (polyphase matmuls).
# Chip-probed a slight LOSS vs lax.conv (5.64 vs 5.54 ms/salience, r3 —
# the dilated conv is already matmul-shaped enough for XLA here), so the
# default keeps lax.conv; the kernel stays behind this knob for future
# toolchains (see docs/PERFORMANCE.md).
CONVT_MM_MIN_CH = int(os.environ.get("RVC_TPU_RMVPE_CONVT_MM_MIN_CH", str(10**9)))


def _convt2x2_mm(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d k3 s2 p1 outpad1 (exact 2x up) as 9 polyphase
    matmuls — same small-spatial MXU rationale as Conv3x3. torch semantics:
    out[2i + k - 1] += x[i] W[k] per dim, so output phase r=0 takes the
    single k=1 tap and r=1 takes k=2 (same block) + k=0 (next block).
    kernel: [3, 3, Ci, Co] (unflipped)."""
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    k = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    xh = jax.lax.slice(xp, (0, 1, 0, 0), (b, h + 1, w, ci))   # x[i+1, j]
    xw = jax.lax.slice(xp, (0, 0, 1, 0), (b, h, w + 1, ci))   # x[i, j+1]
    xhw = jax.lax.slice(xp, (0, 1, 1, 0), (b, h + 1, w + 1, ci))

    def mm(xs, kh, kw):
        return jnp.einsum("bhwi,io->bhwo", xs, k[kh, kw],
                          preferred_element_type=jnp.float32)

    p00 = mm(x, 1, 1)
    p01 = mm(x, 1, 2) + mm(xw, 1, 0)
    p10 = mm(x, 2, 1) + mm(xh, 0, 1)
    p11 = mm(x, 2, 2) + mm(xh, 0, 2) + mm(xw, 2, 0) + mm(xhw, 0, 0)
    y = jnp.stack(
        [jnp.stack([p00, p01], axis=3), jnp.stack([p10, p11], axis=3)],
        axis=2,
    )  # [B, H, 2, W, 2, Co]
    return y.reshape(b, 2 * h, 2 * w, co).astype(x.dtype)


class ConvBlockRes(nn.Module):
    """Two BN-conv-relu stages with residual (RMVPE.py:13-57)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        y = Conv3x3(self.out_channels, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="bn1")(y)
        y = nn.relu(y)
        y = Conv3x3(self.out_channels, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="bn2")(y)
        y = nn.relu(y)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{i}")(x, train)
        if self.pool:
            pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        # ConvTranspose2d k3 s2 p1 outpad1 == exact 2x upsample, expressed as
        # an input-dilated conv with a spatially flipped kernel (same
        # formulation as commons.ConvTranspose1d). pad = k-1-p = 1 left,
        # k-1-p+outpad = 2 right.
        c = x.shape[-1]
        kernel = self.param(
            "up_kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3),
            (3, 3, c, self.out_channels),
        )
        if c >= CONVT_MM_MIN_CH:
            y = _convt2x2_mm(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=(0, 1)),
                window_strides=(1, 1),
                padding=((1, 2), (1, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="up_bn")(y)
        y = nn.relu(y)
        y = jnp.concatenate([y, skip], axis=-1)
        for i in range(self.n_blocks):
            y = ConvBlockRes(self.out_channels, name=f"block_{i}")(y, train)
        return y


class FusedBiGRU(nn.Module):
    """Bidirectional GRU with TPU-friendly scheduling: the input projections
    of all three gates are hoisted out of the scan into two big MXU matmuls,
    and the forward/backward passes run in ONE lax.scan (each step does one
    [B,H]x[H,3H] matmul per direction instead of six small ones). Gate math
    matches torch nn.GRU / flax GRUCell exactly; biases are pre-folded
    (input side carries b_ih + b_hh for r/z, the n gate keeps b_hn inside
    the recurrent term)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, f = x.shape
        hh = self.hidden
        init = nn.initializers.lecun_normal()
        zinit = nn.initializers.zeros
        wi_f = self.param("wi_fwd", init, (f, 3 * hh))
        bi_f = self.param("bi_fwd", zinit, (3 * hh,))
        wh_f = self.param("wh_fwd", init, (hh, 3 * hh))
        bn_f = self.param("bhn_fwd", zinit, (hh,))
        wi_b = self.param("wi_bwd", init, (f, 3 * hh))
        bi_b = self.param("bi_bwd", zinit, (3 * hh,))
        wh_b = self.param("wh_bwd", init, (hh, 3 * hh))
        bn_b = self.param("bhn_bwd", zinit, (hh,))

        xi_f = (x @ wi_f + bi_f).transpose(1, 0, 2)            # [T, B, 3H]
        xi_b = (x @ wi_b + bi_b)[:, ::-1].transpose(1, 0, 2)   # reversed

        def cell(h, xi, wh, bn):
            g = h @ wh                                         # [B, 3H]
            r = jax.nn.sigmoid(xi[:, :hh] + g[:, :hh])
            z = jax.nn.sigmoid(xi[:, hh : 2 * hh] + g[:, hh : 2 * hh])
            n = jnp.tanh(xi[:, 2 * hh :] + r * (g[:, 2 * hh :] + bn))
            return (1.0 - z) * n + z * h

        def step(carry, inp):
            hf, hb = carry
            xf, xb = inp
            hf = cell(hf, xf, wh_f, bn_f)
            hb = cell(hb, xb, wh_b, bn_b)
            return (hf, hb), (hf, hb)

        h0 = jnp.zeros((b, hh), x.dtype)
        _, (of, ob) = jax.lax.scan(step, (h0, h0), (xi_f, xi_b))
        of = of.transpose(1, 0, 2)                             # [B, T, H]
        ob = ob.transpose(1, 0, 2)[:, ::-1]                    # un-reverse
        return jnp.concatenate([of, ob], axis=-1)


class E2EModel(nn.Module):
    """DeepUnet + conv head + BiGRU + salience projection."""

    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16
    gru_hidden: int = 256

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False) -> jax.Array:
        """mel: [B, T, 128] log-mel (T multiple of 32) -> [B, T, 360]."""
        x = mel[..., None]  # NHWC: [B, T, 128, 1]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, name="in_bn")(x)

        skips: List[jax.Array] = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(ch, self.n_blocks, name=f"enc_{i}")(x, train)
            skips.append(skip)
            ch *= 2

        # intermediate: first maps enc_out -> 2x, rest keep (RMVPE.py:151-177)
        for i in range(self.inter_layers):
            x = ResEncoderBlock(ch, self.n_blocks, pool=False, name=f"inter_{i}")(
                x, train
            )

        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, self.n_blocks, name=f"dec_{i}")(
                x, skips[-1 - i], train
            )

        x = nn.Conv(3, (3, 3), padding=1, name="cnn")(x)  # [B, T, 128, 3]
        b, t = x.shape[0], x.shape[1]
        # channel-major flatten [T, 3, 128] -> 384, matching the reference's
        # transpose(1, 2).flatten(-2) (RMVPE.py:336-338) so GRU/fc weights
        # convert 1:1
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, 3 * 128)

        x = FusedBiGRU(self.gru_hidden, name="bigru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


def rmvpe_mel(audio: jax.Array) -> jax.Array:
    """[B, T] 16 kHz audio -> [B, frames, 128] log-mel, RMVPE front numerics
    (htk mel, fmin 30, fmax 8000, centered stft, log clamp 1e-5)."""
    mag = stft_magnitude(audio, WIN, HOP, WIN, center=True, eps=0.0)
    fb = jnp.asarray(
        mel_filterbank(SR, WIN, N_MELS, 30.0, 8000.0, htk=True, norm="slaney").T
    )
    mel = jnp.matmul(mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))


from .cents import CENTS_MAPPING  # noqa: E402  (shared with CREPE)


def decode_salience(salience: jax.Array, thred: float = 0.03) -> jax.Array:
    """[T, 360] salience -> [T] f0 Hz via 9-tap local average around argmax
    (vectorized re-derivation of RMVPE.py:459-512; kernel shared with the
    CREPE decode in predictors/cents.py)."""
    from .cents import weighted_cents_decode

    avg_cents = weighted_cents_decode(
        salience, jnp.argmax(salience, axis=1), xp=jnp, cents_dtype=np.float32
    )
    maxx = jnp.max(salience, axis=1)
    avg_cents = jnp.where(maxx > thred, avg_cents, 0.0)
    f0 = 10.0 * (2.0 ** (avg_cents / 1200.0))
    return jnp.where(f0 == 10.0, 0.0, f0)


class RMVPE:
    """Host-facing predictor: audio in, f0 contour out (jitted per bucket)."""

    def __init__(self, params: Optional[Dict[str, Any]] = None,
                 batch_stats: Optional[Dict[str, Any]] = None,
                 model: Optional[E2EModel] = None):
        self.model = model or E2EModel()
        if params is None:
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, N_MELS))
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self.params = params
        self.batch_stats = batch_stats or {}

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def _infer(params, batch_stats, audio, thred, n_frames):
            """audio [B, T_pad] -> f0 [B, n_frames]. T_pad is a bucketed
            static shape, so only one XLA program compiles per bucket
            (lengths are sliced on the host)."""
            mel = rmvpe_mel(audio)[:, :n_frames]
            pad = (-n_frames) % 32
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            hidden = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, mel
            )
            return jax.vmap(lambda h: decode_salience(h, thred))(
                hidden[:, :n_frames]
            )

        self._infer = _infer

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "RMVPE":
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        params, stats = convert_torch_rmvpe(sd)
        return cls(params, stats)

    def infer_from_audio(self, audio: np.ndarray, thred: float = 0.03) -> np.ndarray:
        """audio: [T] 16 kHz numpy -> f0 [T//160 + 1] (centered stft frames).

        Audio is reflect-padded to a canonical 1 s bucket (see
        predictors/bucketing.py) so jit compiles one program per bucket
        instead of one per distinct file length."""
        return self.infer_batch([np.asarray(audio, np.float32)], thred)[0]

    def infer_batch(self, audios: "list[np.ndarray]",
                    thred: float = 0.03) -> "list[np.ndarray]":
        """Batch several wavs through ONE jitted program (pad to the group's
        bucket, slice true frame counts after)."""
        t_pad = _bucket_samples(max(len(a) for a in audios))
        batch = np.stack([_reflect_to(np.asarray(a, np.float32), t_pad)
                          for a in audios])
        n_frames_pad = t_pad // HOP + 1
        f0 = np.asarray(self._infer(
            self.params, self.batch_stats, jnp.asarray(batch),
            jnp.float32(thred), n_frames_pad,
        ))
        return [f0[i, : len(a) // HOP + 1] for i, a in enumerate(audios)]


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _conv_block(sd, prefix) -> Tuple[Dict, Dict]:
    """torch ConvBlockRes `prefix.conv.{0..4}` (+shortcut) -> flax params+stats."""
    p = {
        "conv1": {"kernel": np.transpose(sd[f"{prefix}.conv.0.weight"], (2, 3, 1, 0))},
        "bn1": {"scale": sd[f"{prefix}.conv.1.weight"], "bias": sd[f"{prefix}.conv.1.bias"]},
        "conv2": {"kernel": np.transpose(sd[f"{prefix}.conv.3.weight"], (2, 3, 1, 0))},
        "bn2": {"scale": sd[f"{prefix}.conv.4.weight"], "bias": sd[f"{prefix}.conv.4.bias"]},
    }
    s = {
        "bn1": {"mean": sd[f"{prefix}.conv.1.running_mean"], "var": sd[f"{prefix}.conv.1.running_var"]},
        "bn2": {"mean": sd[f"{prefix}.conv.4.running_mean"], "var": sd[f"{prefix}.conv.4.running_var"]},
    }
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = {
            "kernel": np.transpose(sd[f"{prefix}.shortcut.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{prefix}.shortcut.bias"],
        }
    return p, s


def _res_stack(sd, prefix, n_blocks) -> Tuple[Dict, Dict]:
    p, s = {}, {}
    for i in range(n_blocks):
        bp, bs = _conv_block(sd, f"{prefix}.conv.{i}")
        p[f"block_{i}"] = bp
        s[f"block_{i}"] = bs
    return p, s


def _gru_params(sd, prefix, hidden: int) -> Dict:
    """torch bidirectional GRU (gates r,z,n stacked) -> FusedBiGRU params.

    The input bias carries b_ih + b_hh for the r/z gates (their sums share
    one bias); the n gate keeps b_hn inside the recurrent term (torch:
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)) — identical form here)."""
    h = hidden
    out: Dict[str, Any] = {}
    for sfx, tag in (("", "fwd"), ("_reverse", "bwd")):
        w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]  # [3H, in], gate order r,z,n
        w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]  # [3H, H]
        b_ih = sd[f"{prefix}.bias_ih_l0{sfx}"]
        b_hh = sd[f"{prefix}.bias_hh_l0{sfx}"]
        bi = b_ih.copy()
        bi[: 2 * h] = bi[: 2 * h] + b_hh[: 2 * h]
        out[f"wi_{tag}"] = w_ih.T
        out[f"bi_{tag}"] = bi
        out[f"wh_{tag}"] = w_hh.T
        out[f"bhn_{tag}"] = b_hh[2 * h :]
    return out


def convert_torch_rmvpe(
    state_dict: Dict[str, Any],
    n_blocks: int = 4,
    en_de_layers: int = 5,
    inter_layers: int = 4,
) -> Tuple[Dict, Dict]:
    """Convert the reference rmvpe.pt (E2E state_dict) to (params, batch_stats)."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    p["in_bn"] = {
        "scale": sd["unet.encoder.bn.weight"],
        "bias": sd["unet.encoder.bn.bias"],
    }
    s["in_bn"] = {
        "mean": sd["unet.encoder.bn.running_mean"],
        "var": sd["unet.encoder.bn.running_var"],
    }

    for i in range(en_de_layers):
        bp, bs = _res_stack(sd, f"unet.encoder.layers.{i}", n_blocks)
        p[f"enc_{i}"], s[f"enc_{i}"] = bp, bs
    for i in range(inter_layers):
        bp, bs = _res_stack(sd, f"unet.intermediate.layers.{i}", n_blocks)
        p[f"inter_{i}"], s[f"inter_{i}"] = bp, bs
    for i in range(en_de_layers):
        pre = f"unet.decoder.layers.{i}"
        up_w = sd[f"{pre}.conv1.0.weight"]  # torch convtranspose: [in, out, 3, 3]
        dp = {
            # stored [3, 3, in, out] (HWIO of the equivalent fwd conv)
            "up_kernel": np.transpose(up_w, (2, 3, 0, 1)),
            "up_bn": {
                "scale": sd[f"{pre}.conv1.1.weight"],
                "bias": sd[f"{pre}.conv1.1.bias"],
            },
        }
        ds = {
            "up_bn": {
                "mean": sd[f"{pre}.conv1.1.running_mean"],
                "var": sd[f"{pre}.conv1.1.running_var"],
            }
        }
        for j in range(n_blocks):
            bp, bs = _conv_block(sd, f"{pre}.conv2.{j}")
            dp[f"block_{j}"] = bp
            ds[f"block_{j}"] = bs
        p[f"dec_{i}"], s[f"dec_{i}"] = dp, ds

    p["cnn"] = {
        "kernel": np.transpose(sd["cnn.weight"], (2, 3, 1, 0)),
        "bias": sd["cnn.bias"],
    }
    p["bigru"] = _gru_params(sd, "fc.0.gru", 256)
    p["fc"] = {"kernel": sd["fc.1.weight"].T, "bias": sd["fc.1.bias"]}

    return jax.tree.map(jnp.asarray, p), jax.tree.map(jnp.asarray, s)
