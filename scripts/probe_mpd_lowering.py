"""On-chip A/B of MPD period-conv lowerings (round-5 train-step lever).

The r3 attribution (scripts/bench_step_parts.py) puts the discriminator at
28.3 ms of the 63.6 ms step (44%) across its two passes, and the step at
~22% MFU against the chip's demonstrated bf16 matmul rate — the (5,1)
period convs lower through XLA's generic conv path at small spatial
extents. Variants (models/discriminators.py WNConv2d.lowering):

  conv2d        plain NHWC conv (current default)
  batch1d       period axis folded into batch + commons.lower_conv1d
                (time-fold matmul for narrow layers, 1D conv for wide)
  batch1d_fold  same, but the time-fold matmul for EVERY layer

Measures, per variant, honest-sync medians of the three training passes
(fwd / param-grad / input-grad on [2B, Tseg, 1]) and numeric agreement vs
conv2d. Round-3 discipline: gradients are part of the probe (the im2col
fault was backward-only), and scripts/smoke_train_chip.py must pass with
the winner before it lands as default.

Usage: python scripts/probe_mpd_lowering.py [batch] [reps]
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
from rvc_tpu.train import losses as L
from rvc_tpu.train.step import _to_bf16


def bench(fn, *args, reps=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:8])  # serial programs: last sync bounds all
        ts.append((time.perf_counter() - t0) / reps * 1e3)
    return sorted(ts)[1]


def main(batch=8, reps=20):
    cfg = get_config(48000)
    seg = cfg.train.segment_size
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(batch, seg, 1)) * 0.1, jnp.float32)
    y_hat = jnp.asarray(rng.normal(size=(batch, seg, 1)) * 0.1, jnp.float32)

    base = MultiPeriodDiscriminator()
    params = jax.jit(base.init)(jax.random.PRNGKey(0), wave, y_hat)["params"]
    jax.block_until_ready(params)

    ref_out = None
    for low in ("conv2d", "batch1d", "batch1d_fold"):
        model = MultiPeriodDiscriminator(lowering=low)

        def d_apply(pd, y, yh):
            pd = _to_bf16(pd)
            return model.apply({"params": pd}, y.astype(jnp.bfloat16),
                               yh.astype(jnp.bfloat16))

        fwd = jax.jit(lambda pd, y, yh: d_apply(pd, y, yh)[:2])

        def d_loss(pd, y, yh):
            y_d_r, y_d_g, _, _ = d_apply(pd, y, yh)
            return L.discriminator_loss(y_d_r, y_d_g)

        pgrad = jax.jit(jax.grad(d_loss))

        def g_adv(yh, pd, y):
            _, y_d_g, fmap_r, fmap_g = d_apply(pd, y, yh)
            return L.generator_loss(y_d_g) + L.feature_loss(fmap_r, fmap_g)

        igrad = jax.jit(jax.grad(g_adv))

        # numeric agreement (bf16 tolerance) before timing
        o = fwd(params, wave, y_hat)
        flat = jnp.concatenate([r.ravel() for r in o[0] + o[1]])
        if ref_out is None:
            ref_out = flat
        else:
            rel = float(jnp.abs(flat - ref_out).max()
                        / (jnp.abs(ref_out).max() + 1e-9))
            print(f"  {low}: fwd rel vs conv2d = {rel:.2e}", flush=True)
            assert rel < 5e-2, f"{low} diverges: {rel}"

        t_f = bench(fwd, params, wave, y_hat, reps=reps)
        t_p = bench(pgrad, params, wave, y_hat, reps=reps)
        t_i = bench(igrad, y_hat, params, wave, reps=reps)
        print(f"{low:14s} fwd {t_f:7.2f}  param-grad {t_p:7.2f}  "
              f"input-grad {t_i:7.2f}  (2-pass total ~{t_p + t_i:7.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
