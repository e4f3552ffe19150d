"""CREPE pitch estimator in flax (full + tiny capacities).

Parity target: the reference's torchcrepe usage (rvc/infer/pipeline.py:212-259,
rvc/train/extract/extract.py:51-75): 1024-sample frames at 16 kHz, per-frame
normalization (mean/std), 6 conv blocks (BN + ReLU + maxpool2), Linear -> 360
sigmoid salience, cents decode (weighted local average or Viterbi), quantile
normalization of the input loudness, NaN-interp resize to p_len.

TPU design: frames are extracted with a strided window op and the whole
conv stack runs as one batched NHWC graph — no per-frame python loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stft import frame_signal
from .cents import CENTS_MAPPING, N_CLASS, weighted_cents_decode

SR = 16000
WINDOW = 1024

# capacity: full = 32x multiplier, tiny = 4x (crepe paper / torchcrepe)
CAPACITIES = {"full": 32, "tiny": 4}
BASE_FILTERS = (32, 4, 4, 4, 8, 16)
KERNELS = (512, 64, 64, 64, 64, 64)
STRIDES = (4, 1, 1, 1, 1, 1)


class CrepeModel(nn.Module):
    capacity: str = "full"

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> jax.Array:
        """frames [N, 1024] (already normalized) -> salience [N, 360]."""
        mult = CAPACITIES[self.capacity]
        x = frames[:, :, None, None]  # NHWC: [N, 1024, 1, 1]
        for i, (f, k, s) in enumerate(zip(BASE_FILTERS, KERNELS, STRIDES)):
            # torchcrepe pads 'same'-style: (254, 254) for layer 1, (31, 32) after
            pad = (254, 254) if i == 0 else (31, 32)
            x = nn.Conv(
                f * mult, (k, 1), strides=(s, 1),
                padding=(pad, (0, 0)), name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, name=f"bn{i + 1}"
            )(x)
            x = nn.max_pool(x, (2, 1), strides=(2, 1))
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = nn.Dense(N_CLASS, name="classifier")(x)
        return jax.nn.sigmoid(x)


def _decode_weighted(salience: np.ndarray) -> np.ndarray:
    """Weighted local average around argmax (torchcrepe weighted_argmax)."""
    return weighted_cents_decode(salience, salience.argmax(axis=1))


# triangular transition prior: zero outside |bin distance| < 12 (torchcrepe)
_VITERBI_W = 12


def _decode_viterbi(salience: np.ndarray) -> np.ndarray:
    """Viterbi smoothing over pitch bins (torchcrepe default decoder):
    triangular transition prior over bin distance, zero outside the
    +/-11-bin band — so the DP update is banded: 23 shifted adds of length
    360 per frame instead of a dense 360x360 matrix (~14x less work, and
    the -inf out-of-band log-prob is exactly librosa/torchcrepe semantics
    rather than the log(eps) a dense `trans + eps` would give)."""
    t, n = salience.shape
    offs = np.arange(-(_VITERBI_W - 1), _VITERBI_W)          # -11..11
    w_band = (_VITERBI_W - np.abs(offs)).astype(np.float64)  # 1..12..1
    logw = np.log(w_band)
    # per-source-row normalizer: sum of in-range triangular weights
    log_rowsum = np.log(np.convolve(np.ones(n), w_band, mode="same"))

    obs = salience.astype(np.float64)
    obs = obs / np.maximum(obs.sum(axis=1, keepdims=True), 1e-12)
    log_obs = np.log(obs + 1e-12)

    dp = np.full(n, np.log(1.0 / n)) + log_obs[0]
    back = np.zeros((t, n), np.int32)
    cols = np.arange(n)
    for i in range(1, t):
        a = dp - log_rowsum  # source score incl. row normalization
        cand = np.full((len(offs), n), -np.inf)
        for oi, o in enumerate(offs):  # dest j <- source j - o
            if o >= 0:
                cand[oi, o:] = a[: n - o] + logw[oi]
            else:
                cand[oi, : n + o] = a[-o:] + logw[oi]
        best = cand.argmax(axis=0)
        dp = cand[best, cols] + log_obs[i]
        back[i] = cols - offs[best]
    path = np.zeros(t, np.int32)
    path[-1] = dp.argmax()
    for i in range(t - 2, -1, -1):
        path[i] = back[i + 1, path[i + 1]]
    # refine with weighted average around the viterbi bin
    return weighted_cents_decode(salience, path)


class CREPE:
    def __init__(self, capacity: str = "full",
                 params: Optional[Dict[str, Any]] = None,
                 batch_stats: Optional[Dict[str, Any]] = None):
        self.model = CrepeModel(capacity)
        if params is None:
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, WINDOW))
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self.params = params
        self.batch_stats = batch_stats or {}

        @jax.jit
        def _salience(params, batch_stats, frames):
            mu = jnp.mean(frames, axis=1, keepdims=True)
            # torchcrepe (core.py preprocess) uses torch.std = unbiased ddof=1
            std = jnp.maximum(
                jnp.std(frames, axis=1, keepdims=True, ddof=1), 1e-10)
            frames = (frames - mu) / std
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, frames
            )

        self._salience = _salience

    @classmethod
    def from_torch_checkpoint(cls, path: str, capacity: str = "full") -> "CREPE":
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        # capacity is determined by the weights, not the caller: the
        # classifier in_features is 64*mult (full=2048, tiny=256). One
        # shared crepe.pt path serves both "crepe" and "crepe-tiny", so a
        # mismatched request would otherwise crash with a shape error
        # mid-inference.
        in_features = int(sd["classifier.weight"].shape[1])
        detected = {64 * m: c for c, m in CAPACITIES.items()}.get(in_features)
        if detected is None:
            raise ValueError(
                f"unrecognized crepe checkpoint ({in_features} classifier "
                f"inputs; expected {sorted(64 * m for m in CAPACITIES.values())})"
            )
        if detected != capacity:
            print(f"crepe checkpoint at {path} is capacity {detected!r}; "
                  f"using it instead of the requested {capacity!r}")
        params, stats = convert_torchcrepe(sd)
        return cls(detected, params, stats)

    def predict(
        self,
        audio: np.ndarray,
        hop_length: int = 160,
        fmin: float = 50.0,
        fmax: float = 1100.0,
        decoder: str = "viterbi",
        batch_size: int = 512,
    ) -> np.ndarray:
        """audio [T] 16 kHz -> f0 [T//hop + 1]; frames are centered (pad=True
        semantics of torchcrepe.predict)."""
        audio = np.asarray(audio, np.float32)
        pad = WINDOW // 2
        padded = np.pad(audio, (pad, pad))
        frames = np.asarray(
            frame_signal(jnp.asarray(padded[None]), WINDOW, hop_length)[0]
        )
        sal_parts = []
        for i in range(0, len(frames), batch_size):
            chunk = frames[i : i + batch_size]
            n = len(chunk)
            if n < batch_size:
                # pad the remainder batch to the canonical size so jit
                # compiles exactly one program per batch_size
                chunk = np.pad(chunk, ((0, batch_size - n), (0, 0)))
            sal_parts.append(np.asarray(self._salience(
                self.params, self.batch_stats, jnp.asarray(chunk),
            ))[:n])
        salience = np.concatenate(sal_parts, axis=0)

        # restrict to [fmin, fmax] bins
        cents_lo = 1200 * np.log2(fmin / 10.0)
        cents_hi = 1200 * np.log2(fmax / 10.0)
        mask = (CENTS_MAPPING < cents_lo) | (CENTS_MAPPING > cents_hi)
        salience[:, mask] = 0.0

        cents = (
            _decode_viterbi(salience) if decoder == "viterbi"
            else _decode_weighted(salience)
        )
        f0 = 10.0 * (2.0 ** (cents / 1200.0))
        conf = salience.max(axis=1)
        # the reference applies NO periodicity gate to crepe output — its
        # `source[source < 0.001] = nan` (pipeline.py:252, extract.py:67)
        # thresholds pitch in Hz, which an in-range decode never hits; the
        # max-salience gate here is the nearest honest equivalent
        f0[conf < 1e-3] = 0.0
        return f0.astype(np.float32)


def convert_torchcrepe(state_dict: Dict[str, Any]):
    """torchcrepe Crepe state_dict -> (params, batch_stats)."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i in range(1, 7):
        w = sd[f"conv{i}.weight"]  # [out, 1, K, 1]
        p[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd[f"conv{i}.bias"],
        }
        p[f"bn{i}"] = {
            "scale": sd[f"conv{i}_BN.weight"],
            "bias": sd[f"conv{i}_BN.bias"],
        }
        s[f"bn{i}"] = {
            "mean": sd[f"conv{i}_BN.running_mean"],
            "var": sd[f"conv{i}_BN.running_var"],
        }
    p["classifier"] = {
        "kernel": sd["classifier.weight"].T,
        "bias": sd["classifier.bias"],
    }
    return jax.tree.map(jnp.asarray, p), jax.tree.map(jnp.asarray, s)
