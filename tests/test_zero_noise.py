"""Zero-noise debug mode: all stochastic sites silenced -> identical outputs
for different rngs (the numeric-diff mode called out in SURVEY.md §7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_config(48000)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, filter_length=256, hop_length=64, win_length=256
        ),
        model=dataclasses.replace(
            cfg.model,
            inter_channels=8, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=1, upsample_initial_channel=16, gin_channels=8,
            spk_embed_dim=4, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        ),
        train=dataclasses.replace(cfg.train, segment_size=64 * 4),
    )


def _inputs(cfg, t=12):
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(1, t, 768)), jnp.float32),
        jnp.asarray([t], jnp.int32),
        jnp.full((1, t), 100, jnp.int32),
        jnp.full((1, t), 220.0, jnp.float32),
        jnp.asarray([0], jnp.int32),
    )


def test_zero_noise_infer_is_deterministic(tiny_cfg):
    model = dataclasses.replace(
        Synthesizer.from_config(tiny_cfg), zero_noise=True,
        posterior_layers=2, flow_layers=1,
    )
    phone, lengths, pitch, pitchf, sid = _inputs(tiny_cfg)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        phone, lengths, pitch, pitchf,
        jnp.zeros((1, 12, tiny_cfg.data.spec_channels)), lengths, sid,
    )
    infer = type(model).infer
    a, _ = model.apply(vs, phone, lengths, pitch, pitchf, sid, method=infer,
                       rngs={"noise": jax.random.PRNGKey(10)})
    b, _ = model.apply(vs, phone, lengths, pitch, pitchf, sid, method=infer,
                       rngs={"noise": jax.random.PRNGKey(99)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noisy_infer_differs_across_rngs(tiny_cfg):
    model = dataclasses.replace(
        Synthesizer.from_config(tiny_cfg), posterior_layers=2, flow_layers=1
    )
    phone, lengths, pitch, pitchf, sid = _inputs(tiny_cfg)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        phone, lengths, pitch, pitchf,
        jnp.zeros((1, 12, tiny_cfg.data.spec_channels)), lengths, sid,
    )
    infer = type(model).infer
    a, _ = model.apply(vs, phone, lengths, pitch, pitchf, sid, method=infer,
                       rngs={"noise": jax.random.PRNGKey(10)})
    b, _ = model.apply(vs, phone, lengths, pitch, pitchf, sid, method=infer,
                       rngs={"noise": jax.random.PRNGKey(99)})
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
