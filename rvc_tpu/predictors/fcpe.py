"""FCPE (Fast Context-based Pitch Estimation) in flax.

Parity target: the vendored torchfcpe package (rvc/lib/predictors/torchfcpe/,
3273 LoC) as used through rvc/lib/predictors/fcpe.py:79-131: CFNaiveMelPE =
conv input stack (GroupNorm(4)+LeakyReLU) -> 6-layer conformer (attention +
GLU depthwise-conv module) -> LayerNorm -> weight-normed Linear -> sigmoid
latent [B, T, 360]; local-argmax cents decode over a linspace cent table,
f0 = 10 * 2^(cents/1200), confidence threshold 0.05. Mel front: 128 log-mels
@16k, win 1024, hop 160.

Attention is the Performer ("fast attention") FAVOR+ random-feature scheme,
numerically matched to model_conformer_naive.py:184-372 (softmax_kernel with
its query max-shift / key `exp(.. + eps)` asymmetry, the 1e-8-regularized
linear_attention normalizer, and the gaussian-orthogonal projection buffer)
so that trained fcpe.pt checkpoints — whose weights were fitted *under* the
approximation — reproduce bit-close f0 contours. The projection matrix is
loaded from the checkpoint's `fast_attention.projection_matrix` buffer.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import mel_filterbank
from ..ops.stft import stft_magnitude

SR = 16000
WIN = 1024
HOP = 160
N_MELS = 128
OUT_DIMS = 360
F0_MIN, F0_MAX = 32.70, 1975.5


def f0_to_cent(f0: float) -> float:
    return 1200.0 * np.log2(f0 / 10.0)


CENT_TABLE = np.linspace(
    f0_to_cent(F0_MIN), f0_to_cent(F0_MAX), OUT_DIMS
).astype(np.float32)


class ConformerConvModule(nn.Module):
    """LayerNorm -> 1x1 conv to 2*2H -> GLU -> depthwise k=31 -> SiLU -> 1x1
    (model_conformer_naive.py:129-158)."""

    dim: int
    expansion: int = 2
    kernel_size: int = 31

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.expansion
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = nn.Conv(inner * 2, (1,), name="pw1")(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)  # GLU
        y = nn.Conv(
            inner, (self.kernel_size,), feature_group_count=inner,
            padding="SAME", name="dw",
        )(y)
        y = jax.nn.silu(y)
        return nn.Conv(self.dim, (1,), name="pw2")(y)


def gaussian_orthogonal_matrix(
    key: jax.Array, nb_rows: int, nb_columns: int
) -> jax.Array:
    """FAVOR+ projection init (model_conformer_naive.py:389-420, scaling=0):
    stacked QR-orthogonalized gaussian blocks, rows rescaled to chi(d) norms."""
    n_blocks = (nb_rows + nb_columns - 1) // nb_columns
    keys = jax.random.split(key, n_blocks + 1)
    blocks = []
    for i in range(n_blocks):
        g = jax.random.normal(keys[i], (nb_columns, nb_columns))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    mat = jnp.concatenate(blocks, axis=0)[:nb_rows]
    mult = jnp.linalg.norm(
        jax.random.normal(keys[-1], (nb_rows, nb_columns)), axis=1
    )
    return mult[:, None] * mat


def _softmax_kernel(
    data: jax.Array, proj: jax.Array, is_query: bool, eps: float = 1e-4
) -> jax.Array:
    """phi(x) random features (model_conformer_naive.py:356-386). Note the
    reference's asymmetry: queries get a max-shift inside exp and `+ eps`
    outside; keys get `+ eps` *inside* the exp and no shift — matched
    verbatim because fcpe.pt was trained under exactly this function."""
    d = data.shape[-1]
    normalizer = d ** -0.25
    ratio = proj.shape[0] ** -0.5
    data_dash = jnp.einsum(
        "...id,jd->...ij", normalizer * data, proj,
        preferred_element_type=jnp.float32,
    )
    diag = (jnp.sum(data * data, axis=-1, keepdims=True) / 2.0) * normalizer**2
    if is_query:
        shift = jnp.max(data_dash, axis=-1, keepdims=True)
        return ratio * (jnp.exp(data_dash - diag - shift) + eps)
    return ratio * jnp.exp(data_dash - diag + eps)


class FCPEAttention(nn.Module):
    """Performer FAVOR+ attention over torchfcpe's to_q/k/v/out
    parameterization (model_conformer_naive.py:184-353). `dim_head` is a
    fixed 64 in the reference regardless of dim/heads (SelfAttention
    signature), so inner_dim = heads * 64 may exceed `dim`."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    use_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        d = self.dim_head
        inner = self.heads * d
        nb_features = int(d * math.log(d))
        proj = self.param(
            "projection_matrix",
            lambda key, shape: gaussian_orthogonal_matrix(key, *shape),
            (nb_features, d),
        )
        proj = jax.lax.stop_gradient(proj)  # buffer, not a weight
        q = nn.Dense(inner, name="to_q")(x)
        k = nn.Dense(inner, name="to_k")(x)
        v = nn.Dense(inner, name="to_v")(x)

        def split(a):
            return a.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if self.use_norm:
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-8)
        qp = _softmax_kernel(q, proj, is_query=True)
        kp = _softmax_kernel(k, proj, is_query=False)
        # linear_attention (model_conformer_naive.py:336-353): two matmuls
        # instead of the T×T score matrix — MXU-friendly, O(T·m·d)
        k_sum = jnp.sum(kp, axis=-2)
        d_inv = 1.0 / (
            jnp.einsum("bhnm,bhm->bhn", qp, k_sum,
                       preferred_element_type=jnp.float32) + 1e-8
        )
        context = jnp.einsum("bhnm,bhne->bhme", kp, v,
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bhme,bhnm,bhn->bhne", context, qp, d_inv,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class CFNEncoderLayer(nn.Module):
    dim: int
    heads: int = 8
    conv_only: bool = False
    use_fa_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.conv_only:
            y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
            x = x + FCPEAttention(
                self.dim, self.heads, use_norm=self.use_fa_norm, name="attn"
            )(y)
        x = x + ConformerConvModule(self.dim, name="conformer")(x)
        return x


class CFNaiveMelPE(nn.Module):
    input_channels: int = N_MELS
    out_dims: int = OUT_DIMS
    hidden_dims: int = 512
    n_layers: int = 6
    n_heads: int = 8
    conv_only: bool = False
    use_fa_norm: bool = False

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, 128] -> sigmoid latent [B, T, 360]."""
        h = nn.Conv(self.hidden_dims, (3,), padding=1, name="in_conv1")(mel)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="in_gn")(h)
        h = jnp.where(h >= 0, h, 0.01 * h)  # torch LeakyReLU default slope
        h = nn.Conv(self.hidden_dims, (3,), padding=1, name="in_conv2")(h)
        for i in range(self.n_layers):
            h = CFNEncoderLayer(
                self.hidden_dims, self.n_heads, self.conv_only,
                self.use_fa_norm, name=f"layer_{i}"
            )(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        # weight-normed output projection (models.py:85-87): fold g into the
        # kernel on conversion; random init keeps a plain Dense.
        h = nn.Dense(self.out_dims, name="output_proj")(h)
        return jax.nn.sigmoid(h)


def fcpe_mel(audio: jax.Array) -> jax.Array:
    """[B, T] 16k -> [B, T//160, 128] log-mel (torchfcpe MelModule numerics,
    mel_extractor.py:95-152: reflect pad (win-hop)//2 left / (win-hop+1)//2
    right, non-centered stft, sqrt(power + 1e-9), librosa slaney mel,
    log clamp 1e-5)."""
    pad_left = (WIN - HOP) // 2
    pad_right = (WIN - HOP + 1) // 2
    y = jnp.pad(audio, ((0, 0), (pad_left, pad_right)), mode="reflect")
    mag = stft_magnitude(y, WIN, HOP, WIN, center=False, eps=1e-9)
    fb = jnp.asarray(mel_filterbank(SR, WIN, N_MELS, 0.0, 8000.0).T)
    mel = jnp.matmul(mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))


def decode_latent(latent: jax.Array, threshold: float = 0.05) -> jax.Array:
    """[T, 360] -> [T] f0 Hz via 9-tap local argmax over the cent table
    (models.py:latent2cents_local_decoder)."""
    table = jnp.asarray(CENT_TABLE)
    center = jnp.argmax(latent, axis=-1)
    conf = jnp.max(latent, axis=-1)
    offs = jnp.arange(-4, 5)
    idx = jnp.clip(center[:, None] + offs[None, :], 0, OUT_DIMS - 1)
    y_l = jnp.take_along_axis(latent, idx, axis=-1)
    ci_l = table[idx]
    cents = jnp.sum(ci_l * y_l, axis=-1) / jnp.maximum(
        jnp.sum(y_l, axis=-1), 1e-12
    )
    f0 = 10.0 * (2.0 ** (cents / 1200.0))
    return jnp.where(conf > threshold, f0, 0.0)


class FCPE:
    """Host-facing predictor (reference fcpe.py:79-131 surface)."""

    def __init__(self, params: Optional[Dict[str, Any]] = None,
                 model: Optional[CFNaiveMelPE] = None):
        self.model = model or CFNaiveMelPE()
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, N_MELS))
            )["params"]
        self.params = params

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def _infer(params, audio, n_frames, threshold):
            mel = fcpe_mel(audio)[:, :n_frames]
            latent = self.model.apply({"params": params}, mel)
            return decode_latent(latent[0], threshold)

        self._infer = _infer

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "FCPE":
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("model", obj) if isinstance(obj, dict) else obj
        sd = {k: v for k, v in sd.items()}
        cfg = (obj.get("config_dict") or {}).get("model", {}) \
            if isinstance(obj, dict) else {}
        # architecture from the checkpoint: hidden width, depth, conv_only
        hidden = int(sd["input_stack.0.weight"].shape[0])
        n_layers = 0
        while f"net.encoder_layers.{n_layers}.conformer.net.0.weight" in sd:
            n_layers += 1
        conv_only = "net.encoder_layers.0.attn.to_q.weight" not in sd
        if not conv_only:
            # inner_dim = heads * 64 (SelfAttention's fixed dim_head=64)
            inner = int(sd["net.encoder_layers.0.attn.to_q.weight"].shape[0])
            n_heads = int(cfg.get("n_heads", inner // 64))
        else:
            n_heads = int(cfg.get("n_heads", 8))
        model = CFNaiveMelPE(
            hidden_dims=hidden, n_layers=n_layers, n_heads=n_heads,
            conv_only=conv_only,
            use_fa_norm=bool(cfg.get("use_fa_norm", False)),
        )
        return cls(convert_torch_fcpe(sd), model=model)

    def compute_f0(
        self, audio: np.ndarray, p_len: Optional[int] = None,
        threshold: float = 0.05, filter_radius: Optional[float] = None,
    ) -> np.ndarray:
        """audio 16k -> f0 contour with unvoiced gaps filled by linear
        interpolation, matching the reference surface
        (fcpe.py:107-131: _interpolate_f0(_resize_f0(f0, p_len))[0]).

        filter_radius: fractional values are the decoder confidence threshold
        (the reference forwards it verbatim, fcpe.py:125); integer medfilt
        radii are handled by the caller and ignored here."""
        if filter_radius is not None and 0.0 < float(filter_radius) < 1.0:
            threshold = float(filter_radius)
        audio = np.asarray(audio, np.float32)
        n_frames = len(audio) // HOP  # torchfcpe framing (see fcpe_mel)
        # bucket the length so jit compiles per 1s bucket, not per file
        from .bucketing import bucket_samples, reflect_to

        padded = reflect_to(audio, bucket_samples(len(audio)))[None, :]
        n_frames_pad = padded.shape[1] // HOP
        f0 = np.asarray(
            self._infer(self.params, jnp.asarray(padded), n_frames_pad,
                        jnp.float32(threshold))
        )[:n_frames]
        if p_len is not None and p_len != len(f0):
            # nan-masked linear resize (reference fcpe.py:69-77 _resize_f0)
            src = f0.astype(np.float64)
            src[src < 0.001] = np.nan
            f0 = np.nan_to_num(np.interp(
                np.arange(0, len(src) * p_len, len(src)) / p_len,
                np.arange(0, len(src)), src,
            ))
        # fill unvoiced gaps (reference fcpe.py:30-67 _interpolate_f0):
        # interior gaps linear between neighbours, edges hold nearest voiced
        voiced = np.nonzero(f0 > 0.0)[0]
        if len(voiced):
            f0 = np.interp(np.arange(len(f0)), voiced, f0[voiced])
        return f0.astype(np.float32)


def convert_torch_fcpe(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map torchfcpe CFNaiveMelPE weights to the flax module."""
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def conv(prefix):
        return {
            "kernel": np.transpose(sd[f"{prefix}.weight"], (2, 1, 0)),
            "bias": sd[f"{prefix}.bias"],
        }

    p: Dict[str, Any] = {
        "in_conv1": conv("input_stack.0"),
        "in_gn": {
            "scale": sd["input_stack.1.weight"],
            "bias": sd["input_stack.1.bias"],
        },
        "in_conv2": conv("input_stack.3"),
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    # weight-normed output projection -> folded dense
    if "output_proj.parametrizations.weight.original0" in sd:
        g = sd["output_proj.parametrizations.weight.original0"]
        v = sd["output_proj.parametrizations.weight.original1"]
    elif "output_proj.weight_g" in sd:
        g = sd["output_proj.weight_g"]
        v = sd["output_proj.weight_v"]
    else:
        g, v = None, sd["output_proj.weight"]
    if g is not None:
        norm = np.sqrt((v**2).sum(axis=1, keepdims=True) + 1e-12)
        w = v / norm * g.reshape(-1, 1)
    else:
        w = v
    p["output_proj"] = {"kernel": w.T, "bias": sd["output_proj.bias"]}

    n_layers = 0
    while f"net.encoder_layers.{n_layers}.conformer.net.0.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        pre = f"net.encoder_layers.{i}"
        layer: Dict[str, Any] = {}
        if f"{pre}.attn.to_q.weight" in sd:  # absent in conv_only checkpoints
            layer["norm"] = {
                "scale": sd[f"{pre}.norm.weight"],
                "bias": sd[f"{pre}.norm.bias"],
            }
            proj_key = f"{pre}.attn.fast_attention.projection_matrix"
            if proj_key in sd:
                proj = sd[proj_key]
            else:  # ancient ckpt without the buffer: deterministic redraw
                d = int(sd[f"{pre}.attn.to_q.weight"].shape[0])
                d_head = 64 if d % 64 == 0 else d
                proj = np.asarray(gaussian_orthogonal_matrix(
                    jax.random.PRNGKey(0), int(d_head * math.log(d_head)),
                    d_head,
                ))
            layer["attn"] = {
                "projection_matrix": proj,
                # torch nn.Linear default bias=True on all four projections
                "to_q": {"kernel": sd[f"{pre}.attn.to_q.weight"].T,
                         "bias": sd[f"{pre}.attn.to_q.bias"]},
                "to_k": {"kernel": sd[f"{pre}.attn.to_k.weight"].T,
                         "bias": sd[f"{pre}.attn.to_k.bias"]},
                "to_v": {"kernel": sd[f"{pre}.attn.to_v.weight"].T,
                         "bias": sd[f"{pre}.attn.to_v.bias"]},
                "to_out": {
                    "kernel": sd[f"{pre}.attn.to_out.weight"].T,
                    "bias": sd[f"{pre}.attn.to_out.bias"],
                },
            }
        layer.update({
            "conformer": {
                "norm": {
                    "scale": sd[f"{pre}.conformer.net.0.weight"],
                    "bias": sd[f"{pre}.conformer.net.0.bias"],
                },
                "pw1": {
                    "kernel": np.transpose(sd[f"{pre}.conformer.net.2.weight"], (2, 1, 0)),
                    "bias": sd[f"{pre}.conformer.net.2.bias"],
                },
                "dw": {
                    "kernel": np.transpose(sd[f"{pre}.conformer.net.4.conv.weight"], (2, 1, 0)),
                    "bias": sd[f"{pre}.conformer.net.4.conv.bias"],
                },
                "pw2": {
                    "kernel": np.transpose(sd[f"{pre}.conformer.net.6.weight"], (2, 1, 0)),
                    "bias": sd[f"{pre}.conformer.net.6.bias"],
                },
            },
        })
        p[f"layer_{i}"] = layer
    return jax.tree.map(jnp.asarray, p)
