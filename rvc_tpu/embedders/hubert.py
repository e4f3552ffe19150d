"""HuBERT / ContentVec content encoder in flax (the frozen feature extractor).

Parity target: the reference's `transformers.HubertModel` usage
(rvc/lib/utils.py:31-34,96-146; rvc/infer/pipeline.py:449-452): 16 kHz mono in,
`last_hidden_state` [1, T/320, 768] out; v1 checkpoints add a `final_proj`
Linear(768->256). The registry covers {contentvec, chinese/japanese/korean
hubert-base, spin, custom} — all share the hubert-base architecture.

This is a from-scratch flax implementation of the hubert-base encoder
(7-layer conv front-end with group norm, conv positional embedding, 12
post-LN transformer layers), plus a converter from torch HubertModel
checkpoints. Everything is NTC with static shapes; the whole embedder jits
into a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    final_proj_dim: Optional[int] = None  # 256 for v1 checkpoints

    @property
    def downsample(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out  # 320


class ConvFeatureExtractor(nn.Module):
    """7 strided conv layers, group-norm on the first (hubert-base 'group'
    feat_extract_norm), GELU."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T] raw 16k audio -> [B, frames, conv_dim[-1]]
        h = x[..., None]
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}",
            )(h)
            if i == 0:
                h = nn.GroupNorm(
                    num_groups=dim, epsilon=self.cfg.layer_norm_eps, name="group_norm"
                )(h)
            h = jax.nn.gelu(h, approximate=False)
        return h


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16, weight-norm),
    same-padded with one trailing sample dropped for even kernels."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg.hidden_size
        k = self.cfg.num_conv_pos_embeddings
        groups = self.cfg.num_conv_pos_embedding_groups
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (k, c // groups, c),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(jnp.square(kernel), axis=(0, 1)) + 1e-12
            ),
            (c,),
        )
        # torch weight_norm(dim=2) on [out, in/groups, K] == per-out-channel.
        norm = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=(0, 1), keepdims=True) + 1e-12)
        kernel = kernel / norm * g[None, None, :]
        bias = self.param("bias", nn.initializers.zeros, (c,))
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=((pad, pad),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        ) + bias
        if k % 2 == 0:
            y = y[:, :-1, :]
        return jax.nn.gelu(y, approximate=False)


class TransformerLayer(nn.Module):
    """Post-LN transformer encoder layer (hubert-base)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg.hidden_size
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.num_heads,
            qkv_features=c,
            out_features=c,
            use_bias=True,
            name="attention",
        )(x, x)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(
            x + attn_out
        )
        h = nn.Dense(self.cfg.intermediate_size, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="output_dense")(h)
        return nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="final_layer_norm")(
            x + h
        )


class _ScannedTransformerLayer(nn.Module):
    """Scan-compatible wrapper: (carry, _) -> (carry, None)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, h: jax.Array, _):
        return TransformerLayer(self.cfg, name="layer")(h), None


class FlaxHubert(nn.Module):
    cfg: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        """audio: [B, T] 16 kHz float -> last_hidden_state [B, T//320, H]
        (or [B, T//320, final_proj_dim] when a v1 final_proj is configured)."""
        cfg = self.cfg
        h = ConvFeatureExtractor(cfg, name="feature_extractor")(audio)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="feature_projection_norm")(h)
        h = nn.Dense(cfg.hidden_size, name="feature_projection")(h)

        h = h + ConvPositionalEmbedding(cfg, name="pos_conv_embed")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(h)
        # the 12 uniform layers run as ONE scanned program: the compiled HLO
        # holds a single layer body + a loop, cutting trace/compile time ~12x
        # for this stack with identical math (params stacked on axis 0)
        scan = nn.scan(
            _ScannedTransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )
        h, _ = scan(cfg, name="layers")(h, None)
        if cfg.final_proj_dim:
            h = nn.Dense(cfg.final_proj_dim, name="final_proj")(h)
        return h


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _split_heads_attn(prefix: str, sd: Dict[str, np.ndarray], cfg: HubertConfig):
    """Map torch HubertAttention weights to flax MultiHeadDotProductAttention."""
    h, nh = cfg.hidden_size, cfg.num_heads
    hd = h // nh

    def wq(name):
        w = sd[f"{prefix}.{name}.weight"]  # [out, in]
        return w.T.reshape(h, nh, hd)  # [in, heads, head_dim]

    def bq(name):
        return sd[f"{prefix}.{name}.bias"].reshape(nh, hd)

    out_w = sd[f"{prefix}.out_proj.weight"].T.reshape(nh, hd, h)
    return {
        "query": {"kernel": wq("q_proj"), "bias": bq("q_proj")},
        "key": {"kernel": wq("k_proj"), "bias": bq("k_proj")},
        "value": {"kernel": wq("v_proj"), "bias": bq("v_proj")},
        "out": {"kernel": out_w, "bias": sd[f"{prefix}.out_proj.bias"]},
    }


def convert_torch_hubert(
    state_dict: Dict[str, Any], cfg: HubertConfig = HubertConfig()
) -> Dict[str, Any]:
    """Convert a torch `transformers.HubertModel` state_dict (optionally with
    RVC's extra final_proj) to FlaxHubert params."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    p: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]  # [out, in, K]
        fe[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    fe["group_norm"] = {
        "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    p["feature_extractor"] = fe

    p["feature_projection_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["feature_projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }

    # pos conv: torch parametrized weight norm (original0 = g, original1 = v)
    # or legacy weight_g/weight_v keys.
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = sd[f"{base}.parametrizations.weight.original0"]
        v = sd[f"{base}.parametrizations.weight.original1"]
    else:
        g = sd[f"{base}.weight_g"]
        v = sd[f"{base}.weight_v"]
    # v: [out, in/groups, K]; torch weight_norm dim=2 -> g shaped [1, 1, K]?
    # transformers uses dim=2, normalizing over (out, in) per K... recombine
    # exactly and store the folded kernel with unit g.
    norm = np.sqrt((v**2).sum(axis=tuple(d for d in range(v.ndim) if d != 2), keepdims=True) + 1e-12)
    w = v / norm * g  # [out, in/groups, K]
    kernel = np.transpose(w, (2, 1, 0))  # [K, in/groups, out]
    p["pos_conv_embed"] = {
        "kernel": kernel,
        "g": np.sqrt((kernel**2).sum(axis=(0, 1)) + 1e-12),
        "bias": sd[f"{base}.bias"],
    }

    p["encoder_layer_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }

    # layers are scanned: params stack along a new leading axis
    per_layer = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        per_layer.append({
            "attention": _split_heads_attn(f"{pre}.attention", sd, cfg),
            "layer_norm": {
                "scale": sd[f"{pre}.layer_norm.weight"],
                "bias": sd[f"{pre}.layer_norm.bias"],
            },
            "intermediate_dense": {
                "kernel": sd[f"{pre}.feed_forward.intermediate_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.intermediate_dense.bias"],
            },
            "output_dense": {
                "kernel": sd[f"{pre}.feed_forward.output_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.output_dense.bias"],
            },
            "final_layer_norm": {
                "scale": sd[f"{pre}.final_layer_norm.weight"],
                "bias": sd[f"{pre}.final_layer_norm.bias"],
            },
        })
    p["layers"] = {"layer": jax.tree.map(
        lambda *xs: np.stack(xs, axis=0), *per_layer
    )}

    if cfg.final_proj_dim and "final_proj.weight" in sd:
        p["final_proj"] = {
            "kernel": sd["final_proj.weight"].T,
            "bias": sd["final_proj.bias"],
        }

    return jax.tree.map(jnp.asarray, p)


_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _read_safetensors(path: str):
    """Minimal safetensors reader (the wheel isn't baked in): 8-byte LE
    header length, JSON header {name: {dtype, shape, data_offsets}}, raw
    little-endian tensor bytes. Returns {name: torch.Tensor}."""
    import json

    import torch

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        buf = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = buf[start:end]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, _SAFETENSORS_DTYPES[meta["dtype"]])
        out[name] = torch.from_numpy(
            arr.reshape(meta["shape"]).copy())
    return out


def load_embedder(
    model_path: Optional[str] = None,
    cfg: HubertConfig = HubertConfig(),
    rng: Optional[jax.Array] = None,
):
    """Build (module, params). With a torch checkpoint path (state_dict or
    transformers save), convert; otherwise random-init (for tests/benches
    without network access — the reference auto-downloads from HF,
    rvc/lib/utils.py:110-146, which a zero-egress environment cannot)."""
    module = FlaxHubert(cfg)
    if model_path:
        import torch

        if model_path.endswith(".safetensors"):
            sd = _read_safetensors(model_path)
        else:
            obj = torch.load(model_path, map_location="cpu",
                             weights_only=True)
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        params = convert_torch_hubert(sd, cfg)
    else:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        # jit the init: eager init dispatches thousands of tiny ops, each a
        # device round trip — over a tunneled TPU this wedges for minutes
        # (observed in run_extraction); one compiled program initializes in
        # seconds on any backend.
        params = jax.jit(module.init)(rng, jnp.zeros((1, 3200)))["params"]
    return module, params


# Named embedder registry (reference rvc/lib/utils.py:96-146). Each name maps
# to a local directory under models/embedders/; the reference downloads the
# checkpoint from HF on first use — in a zero-egress environment the user
# places pytorch_model.bin there instead.
EMBEDDER_REGISTRY = {
    "contentvec": "contentvec",
    "spin": "spin",
    "chinese-hubert-base": "chinese_hubert_base",
    "japanese-hubert-base": "japanese_hubert_base",
    "korean-hubert-base": "korean_hubert_base",
}


def resolve_embedder_path(
    embedder_model: str = "contentvec",
    embedder_model_custom: Optional[str] = None,
    root: Optional[str] = None,
) -> Optional[str]:
    """Name -> local checkpoint path, or None when absent (random-init
    fallback keeps pipelines runnable). Mirrors load_embedding's dispatch:
    'custom' uses the explicit path, names resolve through the registry."""
    import os

    if embedder_model == "custom" or embedder_model_custom:
        if embedder_model_custom and os.path.exists(embedder_model_custom):
            return embedder_model_custom
        if embedder_model_custom:
            # warn even when a named embedder was also selected — silently
            # ignoring a typo'd custom path converts with the wrong embedder
            print(f"custom embedder not found: {embedder_model_custom}; "
                  f"falling back to "
                  f"{'contentvec' if embedder_model == 'custom' else embedder_model}")
        if embedder_model == "custom":
            embedder_model = "contentvec"
    if embedder_model not in EMBEDDER_REGISTRY:
        raise ValueError(
            f"unknown embedder {embedder_model!r}; expected one of "
            f"{sorted(EMBEDDER_REGISTRY)} or 'custom'"
        )
    root = root or os.path.join("models", "embedders")
    base = os.path.join(root, EMBEDDER_REGISTRY[embedder_model])
    for fn in ("pytorch_model.bin", "model.safetensors", "model.pt"):
        p = os.path.join(base, fn)
        if os.path.exists(p):
            return p
    return None


def load_embedder_by_name(
    embedder_model: str = "contentvec",
    embedder_model_custom: Optional[str] = None,
    cfg: HubertConfig = HubertConfig(),
):
    """Registry-aware loader: (module, params). Missing checkpoints degrade
    to random init with a warning (zero-egress stand-in for the reference's
    auto-download)."""
    path = resolve_embedder_path(embedder_model, embedder_model_custom)
    if path is None:
        print(f"embedder {embedder_model!r} checkpoint not found under "
              "models/embedders/; using random-initialized weights")
    return load_embedder(path, cfg)
