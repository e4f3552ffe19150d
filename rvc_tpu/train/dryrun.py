"""Tiny full-featured train problem for SPMD dryruns and multi-host tests.

Builds a mid-size 48k config with every production train-step feature ON
(uncertainty balancer, double-D update, multiscale mel, bf16 policy) on
shapes small enough to compile fast on virtual CPU devices — shared by
__graft_entry__.dryrun_multichip (driver single-process 8-device check) and
tests/multihost_worker.py (2-process gloo run), so both prove the *same*
step semantics. Mirrors the semantics of the reference's DDP train loop
(rvc/train/train.py:509-514) without its per-GPU process machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple


def build_tiny_train_problem(batch_size: int):
    """Returns (cfg, model_g, model_d, tx_g, tx_d, batch) — deterministic in
    batch_size, so every host (and a single-process rerun) builds bitwise
    identical weights and data."""
    import jax.numpy as jnp
    import numpy as np

    from ..configs import get_config
    from ..models.synthesizer import Synthesizer
    from ..models.discriminators import MultiPeriodDiscriminator
    from .optimizers import make_optimizer

    cfg = get_config(48000)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, filter_length=256, hop_length=64, win_length=256
        ),
        model=dataclasses.replace(
            cfg.model,
            inter_channels=48, hidden_channels=48, filter_channels=96,
            n_heads=2, n_layers=2, upsample_initial_channel=64,
            gin_channels=48, spk_embed_dim=4,
            resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3), (1, 3)),
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        ),
        train=dataclasses.replace(
            cfg.train, segment_size=64 * 8, use_multiscale_mel=True,
            use_balancer=True, double_d_update=True,
        ),
    )

    model_g = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=4, flow_layers=2
    )
    model_d = MultiPeriodDiscriminator(periods=(2, 3))

    B, T = batch_size, 12
    rng = np.random.default_rng(0)
    batch: Dict[str, Any] = {
        "phone": jnp.asarray(rng.normal(size=(B, T, 768)), jnp.float32),
        "phone_lengths": jnp.full((B,), T, jnp.int32),
        "pitch": jnp.full((B, T), 100, jnp.int32),
        "pitchf": jnp.full((B, T), 220.0, jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.normal(size=(B, T, cfg.data.spec_channels))),
            jnp.float32,
        ),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "wave": jnp.asarray(
            rng.normal(size=(B, T * cfg.data.hop_length, 1)) * 0.1,
            jnp.float32,
        ),
        "sid": jnp.zeros((B,), jnp.int32),
    }

    tx_g = make_optimizer("adamw", 1e-4)
    tx_d = make_optimizer("adamw", 1e-4)
    return cfg, model_g, model_d, tx_g, tx_d, batch
