"""On-chip train-step smoke: the hard gate for kernel/lowering changes.

Jits and EXECUTES the full default production train step on the attached
TPU — Pallas fused-MRF on, bf16 policy on, MPD matmul lowering on — at the
production per-sample shapes (segment_size 17280 @ 48k) with a small batch,
runs TWO chained steps, and asserts finite metrics + moving losses.

Rule (docs/PERFORMANCE.md, README): every commit that touches `ops/`, a
conv lowering, or the train step must run this ON HARDWARE before landing:

    python scripts/smoke_train_chip.py

The round-3 regression (TPU worker kernel fault in bench_train) shipped
because the last change was probed forward-only; a CPU smoke cannot catch a
Mosaic/XLA codegen fault that only the real chip raises. Exits nonzero on
any fault, prints SMOKE-CHIP OK on success.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_bench_cache"))
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


def main(batch_size: int = 2, frames: int = 400) -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    cfg = get_config(48000)
    model_g = Synthesizer.from_config(cfg)
    model_d = MultiPeriodDiscriminator()

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
    t0 = time.time()
    init_fn = jax.jit(
        lambda r, b: create_train_state(r, cfg, model_g, model_d, tx_g, tx_d, b))
    state = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params_g)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    step = jax.jit(
        make_train_step(cfg, model_g, model_d, tx_g, tx_d, steps_per_epoch=100),
        donate_argnums=(0,))
    t0 = time.time()
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    m1 = {k: float(np.asarray(v)) for k, v in m1.items()}  # forces execution
    print(f"compile+step1 {time.time()-t0:.1f}s", flush=True)
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    m2 = {k: float(np.asarray(v)) for k, v in m2.items()}

    bad = [k for k, v in {**m1, **m2}.items() if not np.isfinite(v)]
    assert not bad, f"non-finite metrics: {bad}"
    for k in ("loss_disc", "loss_gen_all", "loss_mel"):
        assert m1[k] != m2[k], f"{k} frozen across steps: update not applied"
    print(json.dumps({"step1": {k: round(v, 4) for k, v in m1.items()},
                      "step2": {k: round(v, 4) for k, v in m2.items()}}))
    print("SMOKE-CHIP OK")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=400)
    a = ap.parse_args()
    main(a.batch, a.frames)
