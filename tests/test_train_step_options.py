"""Train-step option coverage: balancer, WGAN, double-D update, remat,
single-scale mel — each runs one real step on a tiny model (single device).
Parity targets cited in rvc_tpu/train/step.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.train.optimizers import make_optimizer
from rvc_tpu.train.step import create_train_state, make_train_step

pytestmark = pytest.mark.slow


def _cfg(**train_over):
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
        train=dataclasses.replace(
            cfg.train, segment_size=64 * 4, use_multiscale_mel=False,
            **train_over,
        ),
    )


def _batch(cfg, b=2, t=12):
    rng = np.random.default_rng(0)
    return {
        "phone": jnp.asarray(rng.normal(size=(b, t, 768)), jnp.float32),
        "phone_lengths": jnp.full((b,), t, jnp.int32),
        "pitch": jnp.full((b, t), 100, jnp.int32),
        "pitchf": jnp.full((b, t), 220.0, jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.normal(size=(b, t, cfg.data.spec_channels))), jnp.float32
        ),
        "spec_lengths": jnp.full((b,), t, jnp.int32),
        "wave": jnp.asarray(
            rng.normal(size=(b, t * cfg.data.hop_length, 1)) * 0.1, jnp.float32
        ),
        "sid": jnp.zeros((b,), jnp.int32),
    }


def _run_one(cfg):
    model_g = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1
    )
    model_d = MultiPeriodDiscriminator(periods=(2,))
    tx_g = make_optimizer("adamw", 1e-4)
    tx_d = make_optimizer("adamw", 1e-4)
    batch = _batch(cfg)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg, model_g, model_d, tx_g, tx_d, batch
    )
    step = jax.jit(make_train_step(cfg, model_g, model_d, tx_g, tx_d, 10))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    host = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in host.values()), host
    assert int(state.step) == 1
    return state, host


def test_balancer_step_updates_log_sigmas_after_freeze():
    cfg = _cfg(use_balancer=True)
    state, metrics = _run_one(cfg)
    assert state.balancer is not None
    # frozen for the first epochs -> log sigmas unchanged from init
    from rvc_tpu.train.step import BALANCER_INIT

    for k, v in state.balancer.items():
        assert float(v) == pytest.approx(BALANCER_INIT[k], abs=1e-4)


def test_wgan_step():
    _, metrics = _run_one(_cfg(use_wgan=True))
    assert "loss_disc" in metrics


def test_double_d_update_step():
    _, metrics = _run_one(_cfg(double_d_update=True))
    assert metrics["grad_norm_d"] > 0


def test_remat_step_matches_plain():
    cfg_a = _cfg(use_checkpointing=False)
    cfg_b = _cfg(use_checkpointing=True)
    _, m_a = _run_one(cfg_a)
    _, m_b = _run_one(cfg_b)
    # remat must not change the math
    assert m_a["loss_gen_all"] == pytest.approx(m_b["loss_gen_all"], rel=1e-4)


def test_ranger21_optimizer_step():
    cfg = _cfg()
    model_g = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1
    )
    model_d = MultiPeriodDiscriminator(periods=(2,))
    tx_g = make_optimizer("ranger21", 1e-4)
    tx_d = make_optimizer("ranger21", 1e-4)
    batch = _batch(cfg)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg, model_g, model_d, tx_g, tx_d, batch
    )
    step = jax.jit(make_train_step(cfg, model_g, model_d, tx_g, tx_d, 10))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_gen_all"]))
