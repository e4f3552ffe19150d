"""Measure full-size 48k GAN train-step throughput on the attached chip.

Not the driver bench (bench.py reports inference xRT); this is the
steps/sec figure against the BASELINE.md north star (>=3x A100 steps/sec
on v5e-8; here we measure a single chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from rvc_tpu.configs import get_config
from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.train.optimizers import make_optimizer
from rvc_tpu.train.step import create_train_state, make_train_step


# TPU v5e (v5 lite) single-chip peak: 197 TFLOP/s bf16 / 98.5 TFLOP/s f32
# (public spec). MFU below uses the bf16 peak because the step runs the
# matmul-heavy paths in bf16 (train.step policy).
V5E_PEAK_BF16 = 197e12


def main(batch_size: int = 8, frames: int = 400, n_steps: int = 10,
         discriminators: str = "", vocoder: str = "") -> None:
    cfg = get_config(48000)
    model_g = Synthesizer.from_config(cfg)
    if vocoder:
        import dataclasses

        model_g = dataclasses.replace(model_g, vocoder=vocoder)
    if discriminators and discriminators != "mpd":
        from rvc_tpu.models.custom_discriminators import build_discriminator

        model_d = build_discriminator(
            [n.strip() for n in discriminators.split(",") if n.strip()],
            cfg.data.sample_rate,
        )
    else:
        model_d = MultiPeriodDiscriminator()

    B, T = batch_size, frames
    rng = np.random.default_rng(0)
    batch = {
        "phone": jnp.asarray(rng.normal(size=(B, T, 768)), jnp.float32),
        "phone_lengths": jnp.full((B,), T, jnp.int32),
        "pitch": jnp.full((B, T), 100, jnp.int32),
        "pitchf": jnp.full((B, T), 220.0, jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.normal(size=(B, T, cfg.data.spec_channels))), jnp.float32
        ),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "wave": jnp.asarray(
            rng.normal(size=(B, T * cfg.data.hop_length, 1)) * 0.1, jnp.float32
        ),
        "sid": jnp.zeros((B,), jnp.int32),
    }

    tx_g = make_optimizer("adamw", 1e-4)
    tx_d = make_optimizer("adamw", 1e-4)
    print("initializing (jitted)...", flush=True)
    t0 = time.time()
    # one compiled program instead of eager per-op dispatch through the
    # device tunnel
    init_fn = jax.jit(
        lambda rng, batch: create_train_state(
            rng, cfg, model_g, model_d, tx_g, tx_d, batch
        )
    )
    state = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params_g)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    step = jax.jit(
        make_train_step(cfg, model_g, model_d, tx_g, tx_d, steps_per_epoch=100),
        donate_argnums=(0,),
    )
    # XLA's own FLOP estimate for the whole fused step -> MFU
    step_flops = None
    try:
        lowered = step.lower(state, batch, jax.random.PRNGKey(1))
        try:  # pre-optimization estimate: no backend compile needed
            ca = lowered.cost_analysis()
        except Exception:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", flush=True)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss_disc"])  # block_until_ready returns early here
    print(f"compile+first step {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    # steps chain through donated state; fetching the last metrics forces
    # the whole sequence (block_until_ready returns early on this backend)
    np.asarray(metrics["loss_disc"])
    dt = (time.time() - t0) / n_steps
    rec = {
        "metric": "train_steps_per_sec_48k",
        "batch_size": B,
        "frames": T,
        "discriminators": discriminators or "mpd",
        "vocoder": vocoder or "HiFi-GAN(NSF)",
        "step_seconds": round(dt, 4),
        "value": round(1.0 / dt, 3),
        "audio_seconds_per_sec": round(B * cfg.train.segment_size / 48000 / dt, 2),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    if step_flops:
        rec["step_tflops"] = round(step_flops / 1e12, 2)
        rec["mfu_vs_bf16_peak"] = round(step_flops / dt / V5E_PEAK_BF16, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", type=int, nargs="?", default=8)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--discriminators", default="")
    ap.add_argument("--vocoder", default="")
    a = ap.parse_args()
    main(batch_size=a.batch_size, frames=a.frames, n_steps=a.steps,
         discriminators=a.discriminators, vocoder=a.vocoder)
