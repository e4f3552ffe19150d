"""Device-time decomposition of the fused GAN train step.

The r3 per-op profile shows the step compute-bound with the time spread
across dozens of sub-ms fusions; this script attributes it at module
granularity instead — generator fwd / fwd+bwd, discriminator fwd / fwd+bwd,
multiscale-mel fwd+bwd — so structural levers (e.g. a Pallas backward for
the decoder resblocks) can be sized before they are built.

Method: each part is one jitted program, launched N times back-to-back
(TPU executes programs in order, so syncing a tiny slice of the LAST
result bounds the whole sequence) — honest sync, tunnel-RTT amortized to
1/N. Run on the chip: python scripts/bench_step_parts.py [batch] [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from rvc_tpu.configs import get_config
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.train import losses as L
from rvc_tpu.train.optimizers import make_optimizer
from rvc_tpu.train.step import _to_bf16, create_train_state, make_train_step

REPS = 20


def bench(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])  # warm + compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])  # programs run in order: last sync bounds all
    return (time.perf_counter() - t0) / REPS * 1e3


def main(batch_size: int = 8, frames: int = 400) -> None:
    cfg = get_config(48000)
    model_g = Synthesizer.from_config(cfg)
    model_d = MultiPeriodDiscriminator()
    t = cfg.train
    seg_frames = t.segment_size // cfg.data.hop_length

    B, T = batch_size, frames
    rng = np.random.default_rng(0)
    batch = {
        "phone": jnp.asarray(rng.normal(size=(B, T, 768)), jnp.float32),
        "phone_lengths": jnp.full((B,), T, jnp.int32),
        "pitch": jnp.full((B, T), 100, jnp.int32),
        "pitchf": jnp.full((B, T), 220.0, jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.normal(size=(B, T, cfg.data.spec_channels))),
            jnp.float32),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "wave": jnp.asarray(
            rng.normal(size=(B, T * cfg.data.hop_length, 1)) * 0.1,
            jnp.float32),
        "sid": jnp.zeros((B,), jnp.int32),
    }
    tx_g = make_optimizer("adamw", 1e-4)
    tx_d = make_optimizer("adamw", 1e-4)
    print("init (jitted)...", flush=True)
    state = jax.jit(lambda r, b: create_train_state(
        r, cfg, model_g, model_d, tx_g, tx_d, b
    ))(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params_g)

    fwd_batch = dict(batch,
                     phone=batch["phone"].astype(jnp.bfloat16),
                     spec=batch["spec"].astype(jnp.bfloat16))
    ids_slice = jnp.zeros((B,), jnp.int32)
    noise_rng = jax.random.PRNGKey(7)

    def g_forward(params_g):
        p = _to_bf16(params_g)
        out = model_g.apply(
            {"params": p}, fwd_batch["phone"], fwd_batch["phone_lengths"],
            fwd_batch["pitch"], fwd_batch["pitchf"], fwd_batch["spec"],
            fwd_batch["spec_lengths"], fwd_batch["sid"],
            ids_slice=ids_slice, rngs={"noise": noise_rng})
        return out[0].astype(jnp.float32)  # y_hat

    rows = []

    g_fwd = jax.jit(g_forward)
    rows.append(("G fwd (synthesizer, bf16)", bench(g_fwd, state.params_g)))
    y_hat = g_fwd(state.params_g)

    g_fb = jax.jit(jax.grad(lambda p: jnp.sum(g_forward(p) ** 2)))
    rows.append(("G fwd+bwd (param grads)", bench(g_fb, state.params_g)))

    wave = batch["wave"][:, : t.segment_size]

    def d_apply(params_d, y, yh):
        pd = _to_bf16(params_d)
        return model_d.apply({"params": pd}, y.astype(jnp.bfloat16),
                             yh.astype(jnp.bfloat16))

    d_fwd = jax.jit(lambda pd, y, yh: d_apply(pd, y, yh)[:2])
    rows.append(("D fwd (MPD, real+fake)",
                 bench(d_fwd, state.params_d, wave, y_hat)))

    def d_loss(pd, y, yh):
        y_d_r, y_d_g, _, _ = d_apply(pd, y, yh)
        return L.discriminator_loss(y_d_r, y_d_g)

    d_fb = jax.jit(jax.grad(d_loss))
    rows.append(("D fwd+bwd (param grads)",
                 bench(d_fb, state.params_d, wave, y_hat)))

    # G-side D pass: grads flow through y_hat (fmap + adv), params frozen
    def g_adv(yh, pd, y):
        _, y_d_g, fmap_r, fmap_g = d_apply(pd, y, yh)
        return L.generator_loss(y_d_g) + L.feature_loss(fmap_r, fmap_g)

    gadv_fb = jax.jit(jax.grad(g_adv))
    rows.append(("D fwd+bwd through y_hat (adv+fm)",
                 bench(gadv_fb, y_hat, state.params_d, wave)))

    msmel_fb = jax.jit(jax.grad(
        lambda yh, y: L.multiscale_mel_loss(
            y[..., 0], yh[..., 0], cfg.data.sample_rate)))
    rows.append(("multiscale mel fwd+bwd (8 STFTs)",
                 bench(msmel_fb, y_hat, wave)))

    # full step: thread DONATED state through the loop (returning only a
    # scalar would let XLA dead-code-eliminate the parameter updates)
    step = jax.jit(
        make_train_step(cfg, model_g, model_d, tx_g, tx_d,
                        steps_per_epoch=100),
        donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss_disc"])  # warm
    t0 = time.perf_counter()
    for i in range(REPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    np.asarray(metrics["loss_disc"])
    rows.append(("FULL fused step (donated chain)",
                 (time.perf_counter() - t0) / REPS * 1e3))

    print(f"\nB={B} frames={T} seg={t.segment_size} "
          f"double_d={t.double_d_update} reps={REPS}")
    for name, ms in rows:
        print(f"  {name:<36} {ms:8.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
