"""Export our flax Synthesizer weights to a reference-compatible .pth.

The inverse of utils.checkpoints.convert_torch_synthesizer: users can take a
model trained here and load it in the reference (or any RVC fork) — the same
deployable format extract_model.py writes (weights under "model", config
list + metadata fields). Covers the NSF-HiFi-GAN decoder (the reference's
default and pretrained format).

Also serves as a round-trip test oracle for the importer.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _conv1d_out(sd, prefix, p, weight_norm=False):
    kernel = _np(p["kernel"])  # [K, in, out]
    if weight_norm and "g" in p:
        sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1)
        sd[f"{prefix}.weight_v"] = np.transpose(kernel, (2, 1, 0))
    else:
        sd[f"{prefix}.weight"] = np.transpose(kernel, (2, 1, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _conv_transpose1d_out(sd, prefix, p):
    kernel = _np(p["kernel"])  # [K, in, out]
    sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1)
    sd[f"{prefix}.weight_v"] = np.transpose(kernel, (1, 2, 0))  # [in, out, K]
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _dense_out(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _ln_out(sd, prefix, p):
    sd[f"{prefix}.gamma"] = _np(p["scale"])
    sd[f"{prefix}.beta"] = _np(p["bias"])


def _wavenet_out(sd, prefix, p, n_layers=None):
    if "cond_layer" in p:
        _conv1d_out(sd, f"{prefix}.cond_layer", p["cond_layer"], weight_norm=True)
    stacked = p.get("layers", {})
    if n_layers is None:
        flat = _flatten_one(stacked)
        n_layers = (int(np.asarray(next(iter(flat.values()))).shape[0]) + 1
                    if flat else 1)
    for i in range(n_layers - 1):
        layer = {k: np.asarray(v)[i] for k, v in _flatten_one(stacked).items()}
        _conv1d_out(sd, f"{prefix}.in_layers.{i}",
                    _unflatten_one(layer, "in"), weight_norm=True)
        _conv1d_out(sd, f"{prefix}.res_skip_layers.{i}",
                    _unflatten_one(layer, "res_skip"), weight_norm=True)
    i = n_layers - 1
    _conv1d_out(sd, f"{prefix}.in_layers.{i}", p["in_final"], weight_norm=True)
    _conv1d_out(sd, f"{prefix}.res_skip_layers.{i}", p["res_skip_final"],
                weight_norm=True)


def _flatten_one(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_one(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out


def _unflatten_one(flat, root):
    out = {}
    for k, v in flat.items():
        if k.startswith(f"{root}/"):
            out[k[len(root) + 1 :]] = v
    return out


def synthesizer_to_torch_state_dict(
    params: Dict[str, Any],
    n_enc_layers: Optional[int] = None,
    wn_layers_posterior: Optional[int] = None,
    wn_layers_flow: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """flax Synthesizer params -> torch-style state dict (NSF decoder).

    Layer counts default to shape-derived values (scanned-block leading
    dims / coupling key count), so any model geometry exports without
    callers having to thread config through."""
    sd: Dict[str, np.ndarray] = {}

    # text encoder (scanned blocks -> per-layer keys)
    enc = params["enc_p"]
    _dense_out(sd, "enc_p.emb_phone", enc["emb_phone"])
    if "emb_pitch" in enc:
        sd["enc_p.emb_pitch.weight"] = _np(enc["emb_pitch"]["embedding"])
    blocks = _flatten_one(enc["encoder"]["blocks"])
    if n_enc_layers is None:
        n_enc_layers = int(np.asarray(next(iter(blocks.values()))).shape[0])
    for i in range(n_enc_layers):
        layer = {k: np.asarray(v)[i] for k, v in blocks.items()}
        a = f"enc_p.encoder.attn_layers.{i}"
        _conv1d_out(sd, f"{a}.conv_q", _unflatten_one(layer, "attn/conv_q"))
        _conv1d_out(sd, f"{a}.conv_k", _unflatten_one(layer, "attn/conv_k"))
        _conv1d_out(sd, f"{a}.conv_v", _unflatten_one(layer, "attn/conv_v"))
        _conv1d_out(sd, f"{a}.conv_o", _unflatten_one(layer, "attn/conv_o"))
        sd[f"{a}.emb_rel_k"] = layer["attn/emb_rel_k"]
        sd[f"{a}.emb_rel_v"] = layer["attn/emb_rel_v"]
        sd[f"enc_p.encoder.norm_layers_1.{i}.gamma"] = layer["norm1/scale"]
        sd[f"enc_p.encoder.norm_layers_1.{i}.beta"] = layer["norm1/bias"]
        _conv1d_out(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1",
                    _unflatten_one(layer, "ffn/conv_1"))
        _conv1d_out(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2",
                    _unflatten_one(layer, "ffn/conv_2"))
        sd[f"enc_p.encoder.norm_layers_2.{i}.gamma"] = layer["norm2/scale"]
        sd[f"enc_p.encoder.norm_layers_2.{i}.beta"] = layer["norm2/bias"]
    _conv1d_out(sd, "enc_p.proj", enc["proj"])

    # flow
    n_couplings = sum(1 for k in params["flow"] if k.startswith("coupling_"))
    for i in range(n_couplings):
        c = params["flow"][f"coupling_{i}"]
        t = f"flow.flows.{i * 2}"
        _conv1d_out(sd, f"{t}.pre", c["pre"])
        _wavenet_out(sd, f"{t}.enc", c["enc"], wn_layers_flow)
        _conv1d_out(sd, f"{t}.post", c["post"])

    # posterior (full checkpoints only)
    if "enc_q" in params:
        _conv1d_out(sd, "enc_q.pre", params["enc_q"]["pre"])
        _wavenet_out(sd, "enc_q.enc", params["enc_q"]["enc"], wn_layers_posterior)
        _conv1d_out(sd, "enc_q.proj", params["enc_q"]["proj"])

    # NSF decoder
    dec = params["dec"]
    _conv1d_out(sd, "dec.conv_pre", dec["conv_pre"])
    _conv1d_out(sd, "dec.conv_post", dec["conv_post"])
    _dense_out(sd, "dec.m_source.l_linear", dec["m_source"]["l_linear"])
    if "cond" in dec:
        _conv1d_out(sd, "dec.cond", dec["cond"])
    n_ups = sum(1 for k in dec if k.startswith("ups_"))
    num_kernels = sum(1 for k in dec if k.startswith("resblock_0_"))
    for i in range(n_ups):
        _conv_transpose1d_out(sd, f"dec.ups.{i}", dec[f"ups_{i}"])
        _conv1d_out(sd, f"dec.noise_convs.{i}", dec[f"noise_convs_{i}"])
        for j in range(num_kernels):
            rb = dec[f"resblock_{i}_{j}"]
            flat = i * num_kernels + j
            c = 0
            while f"conv1_{c}" in rb:
                _conv1d_out(sd, f"dec.resblocks.{flat}.convs1.{c}",
                            rb[f"conv1_{c}"], weight_norm=True)
                _conv1d_out(sd, f"dec.resblocks.{flat}.convs2.{c}",
                            rb[f"conv2_{c}"], weight_norm=True)
                c += 1

    sd["emb_g.weight"] = _np(params["emb_g"]["embedding"])
    return sd


def _config_list(cfg, sr: int) -> list:
    """The 18-element embedded config the reference loader consumes
    positionally (extract_model.py:61-80; read back by infer.py:469-483,
    e.g. config[-1]=sample_rate)."""
    if cfg is None:
        from ..configs import get_config

        cfg = get_config(sr)
    d, m = cfg.data, cfg.model
    return [
        d.filter_length // 2 + 1,
        cfg.train.segment_size // d.hop_length,  # 40/32/36 for 32/40/48k
        m.inter_channels,
        m.hidden_channels,
        m.filter_channels,
        m.n_heads,
        m.n_layers,
        m.kernel_size,
        m.p_dropout,
        "1",  # resblock type (reference configs use "1")
        list(m.resblock_kernel_sizes),
        [list(t) for t in m.resblock_dilation_sizes],
        list(m.upsample_rates),
        m.upsample_initial_channel,
        list(m.upsample_kernel_sizes),
        m.spk_embed_dim,
        m.gin_channels,
        d.sample_rate,
    ]


def export_rvc_pth(
    params: Dict[str, Any],
    path: str,
    sr: int = 48000,
    vocoder: str = "HiFi-GAN",
    metadata: Optional[Dict[str, Any]] = None,
    cfg=None,
    epoch: int = 0,
    step: int = 0,
    name: Optional[str] = None,
    **kw,
) -> str:
    """Write a reference-loadable deployable .pth: fp16 tensors under
    "weight", the 18-element "config" list, and the metadata fields the
    reference loader reads (extract_model.py:56-106; infer.py reads
    cpt["weight"], cpt["config"])."""
    import datetime
    import hashlib

    import torch

    sd = synthesizer_to_torch_state_dict(params, **kw)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).half()
               for k, v in sd.items() if "enc_q" not in k}
    config = _config_list(cfg, sr)
    name = name or os.path.splitext(os.path.basename(path))[0]
    hash_input = f"{name}-{epoch}-{step}-{sr}-v2-{config}"
    cpt = {
        "weight": tensors,
        "config": config,
        "epoch": epoch,
        "step": step,
        "sr": sr,
        "f0": 1,
        "version": "v2",
        "creation_date": datetime.datetime.now().isoformat(),
        "model_hash": hashlib.sha256(hash_input.encode()).hexdigest(),
        "model_name": name,
        "vocoder": vocoder,
        **(metadata or {}),
    }
    torch.save(cpt, path)
    return path


def _conv2d_out(sd, prefix, p):
    """Weight-normed flax HWIO conv (discriminators.WNConv2d) -> torch
    Conv2d weight_g/weight_v [out, in, kh, kw]."""
    kernel = _np(p["kernel"])  # [kh, kw, in, out]
    sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1, 1)
    sd[f"{prefix}.weight_v"] = np.transpose(kernel, (3, 2, 0, 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def mpd_to_torch_state_dict(
    params: Dict[str, Any],
    periods=(2, 3, 5, 7, 11, 17, 23, 37),
) -> Dict[str, np.ndarray]:
    """Flax MultiPeriodDiscriminator params -> reference torch state_dict
    (rvc/lib/algorithm/discriminators.py:23-148 key layout). Inverse of
    checkpoints.convert_torch_mpd."""
    sd: Dict[str, np.ndarray] = {}
    s = params["disc_s"]
    for i in range(6):
        _conv1d_out(sd, f"discriminators.0.convs.{i}", s[f"conv_{i}"],
                    weight_norm=True)
    _conv1d_out(sd, "discriminators.0.conv_post", s["conv_post"],
                weight_norm=True)
    for j, per in enumerate(periods, start=1):
        d = params[f"disc_p{per}"]
        for i in range(5):
            _conv2d_out(sd, f"discriminators.{j}.convs.{i}", d[f"conv_{i}"])
        _conv2d_out(sd, f"discriminators.{j}.conv_post", d["conv_post"])
    return sd


def export_rvc_d_pth(
    params: Dict[str, Any],
    path: str,
    epoch: int = 0,
    learning_rate: float = 1e-4,
    periods=(2, 3, 5, 7, 11, 17, 23, 37),
) -> str:
    """Write a reference-loadable full D checkpoint ({'model': state_dict,
    'iteration', 'optimizer', 'learning_rate'} — rvc/train/utils.py
    save_checkpoint layout, as consumed by its pretrained-D load path)."""
    import torch

    sd = mpd_to_torch_state_dict(params, periods=periods)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    cpt = {
        "model": tensors,
        "iteration": epoch,
        "optimizer": {},
        "learning_rate": learning_rate,
    }
    torch.save(cpt, path)
    return path


def export_rvc_g_pth(
    params: Dict[str, Any],
    path: str,
    epoch: int = 0,
    learning_rate: float = 1e-4,
    **kw,
) -> str:
    """Write a reference-loadable full G checkpoint ({'model': state_dict,
    'iteration', 'optimizer', 'learning_rate'}). Unlike export_rvc_pth
    (deployable 'weight' format for inference), this is the layout the
    reference's pretrained-G path strict-loads (train.py:755-765), so a run
    trained here can seed reference fine-tuning. Keeps enc_q and fp32."""
    import torch

    sd = synthesizer_to_torch_state_dict(params, **kw)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    cpt = {
        "model": tensors,
        "iteration": epoch,
        "optimizer": {},
        "learning_rate": learning_rate,
    }
    torch.save(cpt, path)
    return path
