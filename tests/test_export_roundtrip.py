"""Round-trip: flax Synthesizer params -> torch state dict -> flax params.

Validates both the exporter (utils/export_torch.py) and the importer
(utils/checkpoints.convert_torch_synthesizer) against each other, including
the scanned-stack restructuring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.utils.checkpoints import convert_torch_synthesizer
from rvc_tpu.utils.export_torch import synthesizer_to_torch_state_dict

pytestmark = pytest.mark.slow

N_ENC_LAYERS = 2
POSTERIOR_LAYERS = 3
FLOW_LAYERS = 2


def _tiny_model():
    cfg = get_config(48000)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, filter_length=256, hop_length=64, win_length=256
        ),
        model=dataclasses.replace(
            cfg.model,
            inter_channels=8, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=N_ENC_LAYERS, upsample_initial_channel=16,
            gin_channels=8, spk_embed_dim=4, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        ),
        train=dataclasses.replace(cfg.train, segment_size=64 * 4),
    )
    model = dataclasses.replace(
        Synthesizer.from_config(cfg),
        posterior_layers=POSTERIOR_LAYERS, flow_layers=FLOW_LAYERS,
    )
    return cfg, model


def test_export_import_roundtrip():
    cfg, model = _tiny_model()
    t = 12
    rng = np.random.default_rng(0)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(rng.normal(size=(1, t, 768)), jnp.float32),
        jnp.asarray([t], jnp.int32),
        jnp.full((1, t), 100, jnp.int32),
        jnp.full((1, t), 220.0, jnp.float32),
        jnp.zeros((1, t, cfg.data.spec_channels)),
        jnp.asarray([t], jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    params = vs["params"]

    sd = synthesizer_to_torch_state_dict(
        params, n_enc_layers=N_ENC_LAYERS,
        wn_layers_posterior=POSTERIOR_LAYERS, wn_layers_flow=FLOW_LAYERS,
    )
    assert "enc_p.encoder.attn_layers.0.conv_q.weight" in sd
    assert "dec.ups.0.weight_v" in sd
    assert "flow.flows.0.enc.in_layers.0.weight_v" in sd
    assert "enc_q.enc.in_layers.0.weight_v" in sd

    back = convert_torch_synthesizer(sd, n_ups=2, num_kernels=1)

    flat_a = _flatten(params)
    flat_b = _flatten(back)
    assert set(flat_a) == set(flat_b), (
        f"missing: {set(flat_a) ^ set(flat_b)}"
    )
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out
