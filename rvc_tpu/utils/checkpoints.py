"""Checkpoint interop + native checkpoint format.

Two jobs:
  1. Convert reference RVC `.pth` checkpoints (weights-only deployable models
     written by rvc/train/process/extract_model.py:27-112, and full training
     ckpts from rvc/train/utils.py:34-118) into flax parameter trees for our
     Synthesizer — including weight-norm g/v recombination in both the legacy
     `weight_g/weight_v` and new `parametrizations.weight.original0/1` key
     styles (utils.py:49-55 back-compat).
  2. Our own native checkpoint format: a single .npz of flattened params plus
     a JSON metadata header mirroring the reference's embedded config list +
     metadata fields (sr/f0/vocoder/version/embedder/speakers_id/hash).

Layouts: torch Conv1d [out,in,K] -> flax [K,in,out]; ConvTranspose1d
[in,out,K] -> [K,in,out] with per-in-channel g; Linear [out,in] -> [in,out].
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# key normalization + primitive converters
# ---------------------------------------------------------------------------


def normalize_weight_norm_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map `parametrizations.weight.original{0,1}` to `weight_g/weight_v`."""
    out = {}
    for k, v in sd.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        out[k] = v
    return out


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def conv1d(sd, prefix, weight_norm=False, bias=True) -> Dict[str, np.ndarray]:
    p: Dict[str, np.ndarray] = {}
    if weight_norm and f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])            # [out, in, K]
        g = _np(sd[f"{prefix}.weight_g"]).reshape(-1)  # [out]
        p["kernel"] = np.transpose(v, (2, 1, 0))
        p["g"] = g
    else:
        w = _np(sd[f"{prefix}.weight"])
        p["kernel"] = np.transpose(w, (2, 1, 0))
        if weight_norm:
            p["g"] = np.sqrt((p["kernel"] ** 2).sum(axis=(0, 1)) + 1e-12)
            # fold so kernel/norm*g reproduces the plain weight
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def conv_transpose1d(sd, prefix, weight_norm=True, bias=True) -> Dict[str, np.ndarray]:
    p: Dict[str, np.ndarray] = {}
    if weight_norm and f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])              # [in, out, K]
        g = _np(sd[f"{prefix}.weight_g"]).reshape(-1)  # [in]
        p["kernel"] = np.transpose(v, (2, 0, 1))       # [K, in, out]
        p["g"] = g
    else:
        w = _np(sd[f"{prefix}.weight"])
        p["kernel"] = np.transpose(w, (2, 0, 1))
        if weight_norm:
            p["g"] = np.sqrt((p["kernel"] ** 2).sum(axis=(0, 2)) + 1e-12)
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def dense(sd, prefix) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def embed(sd, prefix) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[f"{prefix}.weight"])}


def layer_norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.gamma"]), "bias": _np(sd[f"{prefix}.beta"])}


def wavenet(sd, prefix, n_layers=None, has_cond=True) -> Dict[str, Any]:
    """torch WaveNet (modules.py:5-109): in_layers/res_skip_layers/cond_layer.

    Our WaveNet scans the first n-1 uniform layers (params stacked on a new
    leading axis under "layers") and keeps the final skip-only layer separate
    — mirrors models.commons.WaveNet's parameter structure. n_layers is
    auto-detected from the key set when not given."""
    if n_layers is None:
        n_layers = 0
        while (f"{prefix}.in_layers.{n_layers}.weight_v" in sd
               or f"{prefix}.in_layers.{n_layers}.weight" in sd):
            n_layers += 1
    p: Dict[str, Any] = {}
    if has_cond and f"{prefix}.cond_layer.weight_v" in sd:
        p["cond_layer"] = conv1d(sd, f"{prefix}.cond_layer", weight_norm=True)
    per_layer = [
        {
            "in": conv1d(sd, f"{prefix}.in_layers.{i}", weight_norm=True),
            "res_skip": conv1d(sd, f"{prefix}.res_skip_layers.{i}", weight_norm=True),
        }
        for i in range(n_layers - 1)
    ]
    if per_layer:
        p["layers"] = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_layer)
    i = n_layers - 1
    p["in_final"] = conv1d(sd, f"{prefix}.in_layers.{i}", weight_norm=True)
    p["res_skip_final"] = conv1d(sd, f"{prefix}.res_skip_layers.{i}", weight_norm=True)
    return p


# ---------------------------------------------------------------------------
# synthesizer conversion
# ---------------------------------------------------------------------------


def _stack(per_layer):
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_layer)


def _convert_text_encoder(sd, n_layers=None, use_f0: bool = True) -> Dict[str, Any]:
    if n_layers is None:
        n_layers = 0
        while f"enc_p.encoder.attn_layers.{n_layers}.conv_q.weight" in sd:
            n_layers += 1
    blocks = []
    for i in range(n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        blocks.append({
            "attn": {
                "conv_q": conv1d(sd, f"{a}.conv_q"),
                "conv_k": conv1d(sd, f"{a}.conv_k"),
                "conv_v": conv1d(sd, f"{a}.conv_v"),
                "conv_o": conv1d(sd, f"{a}.conv_o"),
                "emb_rel_k": _np(sd[f"{a}.emb_rel_k"]),
                "emb_rel_v": _np(sd[f"{a}.emb_rel_v"]),
            },
            "norm1": layer_norm(sd, f"enc_p.encoder.norm_layers_1.{i}"),
            "ffn": {
                "conv_1": conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                "conv_2": conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
            },
            "norm2": layer_norm(sd, f"enc_p.encoder.norm_layers_2.{i}"),
        })
    p = {
        "emb_phone": dense(sd, "enc_p.emb_phone"),
        "encoder": {"blocks": _stack(blocks)},  # scanned stack
        "proj": conv1d(sd, "enc_p.proj"),
    }
    if use_f0 and "enc_p.emb_pitch.weight" in sd:
        p["emb_pitch"] = embed(sd, "enc_p.emb_pitch")
    return p


def _convert_flow(sd, n_flows: int = 4) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(n_flows):
        t = f"flow.flows.{i * 2}"  # odd entries are parameterless Flips
        p[f"coupling_{i}"] = {
            "pre": conv1d(sd, f"{t}.pre"),
            "enc": wavenet(sd, f"{t}.enc"),
            "post": conv1d(sd, f"{t}.post"),
        }
    return p


def _convert_posterior(sd) -> Dict[str, Any]:
    return {
        "pre": conv1d(sd, "enc_q.pre"),
        "enc": wavenet(sd, "enc_q.enc"),
        "proj": conv1d(sd, "enc_q.proj"),
    }


def _convert_nsf_decoder(
    sd, n_ups: int, num_kernels: int
) -> Dict[str, Any]:
    """HiFiGANNSFGenerator (hifigan_nsf.py:55-207) -> our nsf.py naming."""
    p: Dict[str, Any] = {
        "conv_pre": conv1d(sd, "dec.conv_pre"),
        "conv_post": conv1d(sd, "dec.conv_post", bias=False),
        "m_source": {"l_linear": dense(sd, "dec.m_source.l_linear")},
    }
    if "dec.cond.weight" in sd:
        p["cond"] = conv1d(sd, "dec.cond")
    for i in range(n_ups):
        p[f"ups_{i}"] = conv_transpose1d(sd, f"dec.ups.{i}", weight_norm=True)
        p[f"noise_convs_{i}"] = conv1d(sd, f"dec.noise_convs.{i}")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            rb: Dict[str, Any] = {}
            # count dilations from available keys
            k = 0
            while f"dec.resblocks.{flat}.convs1.{k}.weight_v" in sd or \
                  f"dec.resblocks.{flat}.convs1.{k}.weight" in sd:
                rb[f"conv1_{k}"] = conv1d(
                    sd, f"dec.resblocks.{flat}.convs1.{k}", weight_norm=True
                )
                rb[f"conv2_{k}"] = conv1d(
                    sd, f"dec.resblocks.{flat}.convs2.{k}", weight_norm=True
                )
                k += 1
            p[f"resblock_{i}_{j}"] = rb
    return p


def _convert_mrf_decoder(sd, n_ups: int, num_kernels: int) -> Dict[str, Any]:
    """HiFiGANMRFGenerator (hifigan_mrf.py:223-374) -> models/generators/mrf.py
    naming: conv_pre/ups_i/noise_convs_i/mrf_i_j(layer_k: conv1+conv2)/
    conv_post/cond/m_source."""
    p: Dict[str, Any] = {
        "conv_pre": conv1d(sd, "dec.conv_pre", weight_norm=True),
        "conv_post": conv1d(sd, "dec.conv_post", weight_norm=True),
        "m_source": {"l_linear": dense(sd, "dec.m_source.l_linear")},
    }
    if "dec.cond.weight" in sd:
        p["cond"] = conv1d(sd, "dec.cond")
    for i in range(n_ups):
        p[f"ups_{i}"] = conv_transpose1d(sd, f"dec.upsamples.{i}", weight_norm=True)
        p[f"noise_convs_{i}"] = conv1d(sd, f"dec.noise_convs.{i}")
        for j in range(num_kernels):
            block: Dict[str, Any] = {}
            k = 0
            while f"dec.mrfs.{i}.{j}.layers.{k}.conv1.weight_v" in sd:
                block[f"layer_{k}"] = {
                    "conv1": conv1d(sd, f"dec.mrfs.{i}.{j}.layers.{k}.conv1",
                                    weight_norm=True),
                    "conv2": conv1d(sd, f"dec.mrfs.{i}.{j}.layers.{k}.conv2",
                                    weight_norm=True),
                }
                k += 1
            p[f"mrf_{i}_{j}"] = block
    return p


def _convert_refinegan_decoder(sd, n_ups: int) -> Dict[str, Any]:
    """RefineGANGenerator (refinegan.py:266-416) -> models/generators/
    refinegan.py naming."""
    p: Dict[str, Any] = {
        "pre_conv": conv1d(sd, "dec.pre_conv", weight_norm=True),
        "mel_conv": conv1d(sd, "dec.mel_conv", weight_norm=True),
        "conv_post": conv1d(sd, "dec.conv_post", weight_norm=True, bias=False),
        "m_source": {"merge": {"kernel": _np(sd["dec.m_source.merge.0.weight"]).T}},
    }
    if "dec.cond.weight" in sd:
        p["cond"] = conv1d(sd, "dec.cond")
    for i in range(n_ups):
        p[f"downsample_{i}"] = conv1d(
            sd, f"dec.downsample_blocks.{i}", weight_norm=True
        )
        blk: Dict[str, Any] = {
            "input_conv": conv1d(sd, f"dec.upsample_conv_blocks.{i}.input_conv"),
        }
        for b in range(3):  # kernel sizes (3, 7, 11)
            base = f"dec.upsample_conv_blocks.{i}.blocks.{b}"
            blk[f"adain1_{b}"] = {"weight": _np(sd[f"{base}.0.weight"])}
            blk[f"adain2_{b}"] = {"weight": _np(sd[f"{base}.2.weight"])}
            rb: Dict[str, Any] = {}
            c = 0
            while f"{base}.1.convs1.{c}.weight_v" in sd:
                rb[f"conv1_{c}"] = conv1d(sd, f"{base}.1.convs1.{c}", weight_norm=True)
                rb[f"conv2_{c}"] = conv1d(sd, f"{base}.1.convs2.{c}", weight_norm=True)
                c += 1
            blk[f"resblock_{b}"] = rb
        p[f"upsample_conv_{i}"] = blk
    return p


def convert_torch_synthesizer(
    state_dict: Dict[str, Any],
    n_enc_layers: Optional[int] = None,
    n_ups: int = 4,
    num_kernels: int = 3,
    use_f0: bool = True,
    has_enc_q: bool = True,
    vocoder: str = "HiFi-GAN",
) -> Dict[str, Any]:
    """Torch Synthesizer state_dict -> flax params for models.Synthesizer
    (decoder conversion keyed by the checkpoint's vocoder field; deployable
    ckpts have enc_q stripped, extract_model.py:60-66)."""
    sd = normalize_weight_norm_keys(
        {k: _np(v) for k, v in state_dict.items()}
    )
    if vocoder == "MRF HiFi-GAN" or "dec.mrfs.0.0.layers.0.conv1.weight_v" in sd:
        dec = _convert_mrf_decoder(sd, n_ups, num_kernels)
    elif vocoder == "RefineGAN" or "dec.mel_conv.weight_v" in sd:
        dec = _convert_refinegan_decoder(sd, n_ups)
    else:
        dec = _convert_nsf_decoder(sd, n_ups, num_kernels)
    params: Dict[str, Any] = {
        "enc_p": _convert_text_encoder(sd, n_enc_layers, use_f0),
        "flow": _convert_flow(sd),
        "emb_g": embed(sd, "emb_g"),
        "dec": dec,
    }
    if has_enc_q and "enc_q.pre.weight" in sd:
        params["enc_q"] = _convert_posterior(sd)
    return jax.tree.map(jnp.asarray, params)


def conv2d_wn(sd, prefix) -> Dict[str, np.ndarray]:
    """Weight-normalized torch Conv2d [out,in,kh,kw] -> flax HWIO + g[out]
    (models.discriminators.WNConv2d layout)."""
    p: Dict[str, np.ndarray] = {}
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])              # [out, in, kh, kw]
        g = _np(sd[f"{prefix}.weight_g"]).reshape(-1)  # [out]
        p["kernel"] = np.transpose(v, (2, 3, 1, 0))
        p["g"] = g
    else:
        w = _np(sd[f"{prefix}.weight"])
        p["kernel"] = np.transpose(w, (2, 3, 1, 0))
        p["g"] = np.sqrt((p["kernel"] ** 2).sum(axis=(0, 1, 2)) + 1e-12)
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def convert_torch_mpd(
    state_dict: Dict[str, Any],
    periods=None,
) -> Dict[str, Any]:
    """Torch MultiPeriodDiscriminator state_dict -> flax params for
    models.discriminators.MultiPeriodDiscriminator.

    Reference layout (rvc/lib/algorithm/discriminators.py:23-30):
    discriminators.0 = DiscriminatorS (weight-normed Conv1d, 6 convs +
    conv_post), discriminators.1..8 = DiscriminatorP over the period list
    (weight-normed Conv2d, 5 convs + conv_post). Pretrained f0D*.pth
    checkpoints store this under the full-ckpt 'model' key
    (rvc/train/utils.py:34-118)."""
    sd = normalize_weight_norm_keys(
        {k: _np(v) for k, v in state_dict.items()}
    )
    n_discs = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("discriminators.")),
        default=-1,
    )
    if periods is None:
        # period values are not recorded in the state_dict; map the module
        # count to the known layouts (v2: 8 periods, v1: 5 periods)
        by_count = {9: (2, 3, 5, 7, 11, 17, 23, 37), 6: (2, 3, 5, 7, 11)}
        periods = by_count.get(n_discs)
        if periods is None:
            raise ValueError(
                f"unrecognized MPD layout: {n_discs} sub-discriminators "
                "(expected 9 for v2 periods 2..37 or 6 for v1 periods "
                "2..11); pass periods= explicitly"
            )
    elif n_discs != len(periods) + 1:
        raise ValueError(
            f"checkpoint has {n_discs} sub-discriminators but "
            f"{len(periods)} periods were given"
        )
    params: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i in range(6):
        s[f"conv_{i}"] = conv1d(
            sd, f"discriminators.0.convs.{i}", weight_norm=True
        )
    s["conv_post"] = conv1d(sd, "discriminators.0.conv_post", weight_norm=True)
    params["disc_s"] = s
    for j, per in enumerate(periods, start=1):
        d: Dict[str, Any] = {}
        for i in range(5):
            d[f"conv_{i}"] = conv2d_wn(sd, f"discriminators.{j}.convs.{i}")
        d["conv_post"] = conv2d_wn(sd, f"discriminators.{j}.conv_post")
        params[f"disc_p{per}"] = d
    return jax.tree.map(jnp.asarray, params)


def load_rvc_pth(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference deployable .pth: returns (flax_params, metadata).

    Metadata mirrors extract_model.py fields: config list, sr, f0, version,
    vocoder, embedder_model, speakers_id, author, hash.
    """
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(cpt, dict) and "weight" in cpt:
        # deployable format: tensors live under "weight" (extract_model.py:56)
        weights = cpt["weight"]
    elif isinstance(cpt, dict) and "model" in cpt:
        # full training ckpt (rvc/train/utils.py:34-118)
        weights = cpt["model"]
    else:
        weights = cpt
    # strip any non-tensor metadata that leaked into the weight dict
    weights = {k: v for k, v in weights.items() if hasattr(v, "shape")}
    if any(k.startswith("discriminators.") for k in weights):
        # pretrained discriminator ckpt (f0D*.pth) — not a synthesizer.
        # Full D ckpts store the epoch as 'iteration'
        # (rvc/train/utils.py save_checkpoint layout).
        meta_d = {}
        if isinstance(cpt, dict):
            meta_d = {"epoch": cpt.get("iteration"),
                      "learning_rate": cpt.get("learning_rate")}
        return convert_torch_mpd(weights), meta_d
    meta = {
        k: cpt.get(k)
        for k in ("config", "sr", "f0", "version", "vocoder",
                  "embedder_model", "speakers_id", "author", "model_hash",
                  "epoch", "step")
        if isinstance(cpt, dict)
    }
    cfg_list = meta.get("config") or []
    # config layout (extract_model.py:61-80): [10]=resblock_kernel_sizes,
    # [12]=upsample_rates. Full training ckpts carry NO config/sr metadata
    # (rvc/train/utils.py saves model+iteration only) — derive the decoder
    # geometry and sample rate from the weight shapes instead of guessing
    # 48k defaults, which would ScopeParamShapeError at first conversion.
    ups_ids = [int(k.split(".")[2]) for k in weights
               if k.startswith("dec.ups.") and k.split(".")[2].isdigit()]
    res_ids = [int(k.split(".")[2]) for k in weights
               if k.startswith("dec.resblocks.") and k.split(".")[2].isdigit()]
    if len(cfg_list) > 12 and isinstance(cfg_list[12], (list, tuple)):
        n_ups = len(cfg_list[12])
    elif ups_ids:
        n_ups = max(ups_ids) + 1
    else:
        n_ups = 4
    if len(cfg_list) > 10 and isinstance(cfg_list[10], (list, tuple)):
        num_kernels = len(cfg_list[10])
    elif res_ids:
        num_kernels = (max(res_ids) + 1) // n_ups
    else:
        num_kernels = 3
    if not meta.get("sr"):
        # the first ConvTranspose kernel size is unique per rate
        # (32k: 20, 40k: 16, 48k: 24 — configs/config.py tables)
        k0 = None
        for key in ("dec.ups.0.weight_v", "dec.ups.0.weight",
                    "dec.ups.0.parametrizations.weight.original1"):
            if key in weights:
                k0 = int(weights[key].shape[-1])
                break
        sr = {20: 32000, 16: 40000, 24: 48000}.get(k0)
        if sr is not None:
            meta["sr"] = sr
            print(f"load_rvc_pth: inferred sample_rate={sr} from decoder "
                  f"shapes (checkpoint carries no sr metadata)")
        else:
            print("load_rvc_pth: WARNING — checkpoint has no sr metadata "
                  "and the decoder shape is unrecognized; callers will "
                  "assume 48k, which may mismatch")
    params = convert_torch_synthesizer(
        weights, n_ups=n_ups, num_kernels=num_kernels,
        vocoder=meta.get("vocoder") or "HiFi-GAN",
    )
    return params, meta


def derive_synth_arch(
    params: Dict[str, Any], meta: Dict[str, Any]
) -> Tuple[Dict[str, Any], Optional[int]]:
    """Architecture overrides for rebuilding a Synthesizer around loaded
    weights. The reference builds positionally from the deployable .pth's
    18-element config list (rvc/infer/infer.py:469-483,
    Synthesizer(*cpt["config"])); mirror that so non-default-dims
    checkpoints load instead of ScopeParamShapeError-ing against the
    sample-rate preset. The flow WaveNet depth is NOT in the config list —
    shape-derive it: each coupling's cond_layer emits 2*hidden*n_layers
    channels. Returns (get_config overrides, flow_layers or None)."""
    over: Dict[str, Any] = {}
    cfg_list = meta.get("config") or []
    if len(cfg_list) == 18:
        try:
            over = dict(
                filter_length=(int(cfg_list[0]) - 1) * 2,
                inter_channels=int(cfg_list[2]),
                hidden_channels=int(cfg_list[3]),
                filter_channels=int(cfg_list[4]),
                n_heads=int(cfg_list[5]),
                n_layers=int(cfg_list[6]),
                kernel_size=int(cfg_list[7]),
                p_dropout=float(cfg_list[8]),
                resblock_kernel_sizes=tuple(int(k) for k in cfg_list[10]),
                resblock_dilation_sizes=tuple(
                    tuple(int(d) for d in t) for t in cfg_list[11]
                ),
                upsample_rates=tuple(int(r) for r in cfg_list[12]),
                upsample_initial_channel=int(cfg_list[13]),
                upsample_kernel_sizes=tuple(int(k) for k in cfg_list[14]),
                spk_embed_dim=int(cfg_list[15]),
                gin_channels=int(cfg_list[16]),
            )
        except (TypeError, ValueError):
            over = {}
    flow_layers = None
    try:
        c0 = params["flow"]["coupling_0"]
        hidden = int(np.asarray(c0["pre"]["kernel"]).shape[-1])
        cond_out = int(np.asarray(c0["enc"]["cond_layer"]["kernel"]).shape[-1])
        if hidden > 0 and cond_out % (2 * hidden) == 0:
            flow_layers = cond_out // (2 * hidden)
    except (KeyError, TypeError, IndexError):
        pass
    return over, flow_layers


# ---------------------------------------------------------------------------
# native checkpoint format
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(
    path: str,
    params: Dict[str, Any],
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Write params+metadata as one .npz (metadata JSON under __meta__)."""
    flat = _flatten(jax.tree.map(np.asarray, params))
    meta = dict(metadata or {})
    digest = hashlib.sha256()
    for k in sorted(flat):
        digest.update(k.encode())
        digest.update(flat[k].tobytes())
    meta["model_hash"] = digest.hexdigest()
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return meta["model_hash"]


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    data = np.load(path, allow_pickle=False)
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    meta = {}
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    return jax.tree.map(jnp.asarray, _unflatten(flat)), meta
