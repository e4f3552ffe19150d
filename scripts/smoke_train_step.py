"""Tiny-shape train-step smoke test on a virtual 8-device CPU mesh."""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")

import jax, jax.numpy as jnp, numpy as np
from rvc_tpu.configs import get_config
import dataclasses
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.train.step import make_train_step, create_train_state
from rvc_tpu.train.optimizers import make_optimizer
from rvc_tpu.train.schedules import make_epoch_lr_schedule
from rvc_tpu.parallel import make_mesh, shard_batch, shard_train_step

cfg = get_config(48000)
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(
        cfg.model, inter_channels=32, hidden_channels=32, filter_channels=64,
        n_layers=1, upsample_initial_channel=64, gin_channels=32, spk_embed_dim=4),
    train=dataclasses.replace(cfg.train, segment_size=480*4, use_multiscale_mel=False,
                              use_balancer=True, double_d_update=True),
)

model_g = Synthesizer.from_config(cfg)
model_d = MultiPeriodDiscriminator(periods=(2, 3))

B, T = 8, 12
batch = {
    "phone": jnp.asarray(np.random.randn(B, T, 768), jnp.float32),
    "phone_lengths": jnp.full((B,), T, jnp.int32),
    "pitch": jnp.ones((B, T), jnp.int32) * 100,
    "pitchf": jnp.full((B, T), 220.0, jnp.float32),
    "spec": jnp.asarray(np.abs(np.random.randn(B, T, cfg.data.spec_channels)), jnp.float32),
    "spec_lengths": jnp.full((B,), T, jnp.int32),
    "wave": jnp.asarray(np.random.randn(B, T * cfg.data.hop_length, 1) * 0.1, jnp.float32),
    "sid": jnp.zeros((B,), jnp.int32),
}

sched = make_epoch_lr_schedule(cfg.train.learning_rate, 10, warmup_epochs=2)
tx_g = make_optimizer("ranger21", sched)
tx_d = make_optimizer("adamw", sched)

state = create_train_state(jax.random.PRNGKey(0), cfg, model_g, model_d, tx_g, tx_d, batch)
step = make_train_step(cfg, model_g, model_d, tx_g, tx_d, steps_per_epoch=10)

mesh = make_mesh()
print("mesh:", mesh)
jstep = shard_train_step(step, mesh)
sbatch = shard_batch(batch, mesh)
state, metrics = jstep(state, sbatch, jax.random.PRNGKey(1))
state, metrics = jstep(state, sbatch, jax.random.PRNGKey(2))
print({k: float(v) for k, v in metrics.items()})
print("step:", int(state.step))
assert all(np.isfinite(float(v)) for v in metrics.values()), "non-finite metric"
print("SMOKE OK")
