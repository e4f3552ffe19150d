"""Checkpoint-recorded architecture honored on load.

The reference rebuilds the synthesizer positionally from the deployable
.pth's 18-element config list (rvc/infer/infer.py:469-483,
Synthesizer(*cpt["config"])); a non-default-dims checkpoint must therefore
load into a matching model instead of ScopeParamShapeError-ing against the
sample-rate preset. derive_synth_arch (utils/checkpoints.py) mirrors that
list, plus shape-derives the flow WaveNet depth the list does not carry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.utils.checkpoints import derive_synth_arch

# reference config-list layout (extract_model.py:61-80):
# [spec_channels, segment_size, inter, hidden, filter, heads, layers,
#  kernel, dropout, resblock, res_kernels, res_dilations, up_rates,
#  up_initial, up_kernels, spk_embed, gin, sr]
_CFG_LIST = [
    129, 32, 12, 8, 16, 2, 2, 3, 0.0, "1",
    [3], [[1, 3]], [8, 8], 16, [16, 16], 4, 8, 40000,
]


def test_config_list_maps_to_overrides():
    over, flow_layers = derive_synth_arch({}, {"config": _CFG_LIST})
    assert over == dict(
        filter_length=256, inter_channels=12, hidden_channels=8,
        filter_channels=16, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_rates=(8, 8),
        upsample_initial_channel=16, upsample_kernel_sizes=(16, 16),
        spk_embed_dim=4, gin_channels=8,
    )
    assert flow_layers is None  # no flow weights to derive from

    # malformed / absent lists must not crash or half-override
    assert derive_synth_arch({}, {})[0] == {}
    assert derive_synth_arch({}, {"config": _CFG_LIST[:5]})[0] == {}
    bad = list(_CFG_LIST)
    bad[10] = None  # non-iterable kernel list
    assert derive_synth_arch({}, {"config": bad})[0] == {}


def test_flow_layers_shape_derived():
    hidden = 8
    n_layers = 5
    params = {
        "flow": {
            "coupling_0": {
                "pre": {"kernel": np.zeros((1, 6, hidden))},
                "enc": {"cond_layer": {
                    "kernel": np.zeros((1, 8, 2 * hidden * n_layers))
                }},
            }
        }
    }
    _, flow_layers = derive_synth_arch(params, {})
    assert flow_layers == n_layers


@pytest.mark.slow
def test_nondefault_pth_loads_and_infers(tmp_path):
    """Round-trip: a tiny NON-default-dims synthesizer exported to a
    deployable .pth loads back through the derive path and runs infer on
    the loaded weights (proving no preset-shape mismatch)."""
    from rvc_tpu.utils.checkpoints import load_rvc_pth
    from rvc_tpu.utils.export_torch import export_rvc_pth

    flow_layers = 2
    cfg = get_config(40000)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, filter_length=256, hop_length=64, win_length=256
        ),
        model=dataclasses.replace(
            cfg.model,
            inter_channels=12, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=2, kernel_size=3,
            upsample_initial_channel=16, gin_channels=8, spk_embed_dim=4,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        ),
        train=dataclasses.replace(cfg.train, segment_size=64 * 4),
    )
    model = dataclasses.replace(
        Synthesizer.from_config(cfg),
        posterior_layers=2, flow_layers=flow_layers,
    )
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
    path = str(tmp_path / "tiny_nondefault.pth")
    export_rvc_pth(
        vs["params"], path, sr=40000, cfg=cfg,
        n_enc_layers=2, wn_layers_posterior=2, wn_layers_flow=flow_layers,
    )

    params, meta = load_rvc_pth(path)
    over, fl = derive_synth_arch(params, meta)
    assert over["inter_channels"] == 12
    assert over["upsample_rates"] == (8, 8)
    assert over["filter_length"] == 256
    assert fl == flow_layers

    spk = over.pop("spk_embed_dim")
    cfg2 = get_config(40000, use_f0=True, spk_embed_dim=spk,
                      text_enc_hidden_dim=768, **over)
    model2 = Synthesizer.from_config(cfg2)
    if fl != model2.flow_layers:
        model2 = dataclasses.replace(model2, flow_layers=fl)

    # infer on the LOADED params through the REBUILT model — exactly what
    # converter.get_vc does; mismatched dims would ScopeParamShapeError
    o, mask = model2.apply(
        {"params": params},
        jnp.asarray(rng.normal(size=(1, t, 768)), jnp.float32),
        jnp.asarray([t], jnp.int32),
        jnp.full((1, t), 100, jnp.int32),
        jnp.full((1, t), 220.0, jnp.float32),
        jnp.zeros((1,), jnp.int32),
        0.0,  # temperature 0: prior noise off (sine gen still draws "noise")
        method=Synthesizer.infer,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    assert np.all(np.isfinite(np.asarray(o)))
    assert o.shape[1] == t * 64  # hop 64 upsampling (8*8), layout (B, S, 1)
