"""Chip probe: MPD DiscriminatorP (k,1) convs — lax.conv vs im2col matmul.

The r3 train-step attribution (bench_step_parts) puts the discriminator at
44% of step time (28.3 ms across its two passes). DiscriminatorP's convs
have width-1 kernels at tiny spatial extents (H as low as 2-36 at the deep
levels), the same small-spatial tiling pathology the RMVPE shifted-matmul
rewrite fixed. _convk1_mm (models/discriminators.py) reformulates each as
one [B*H_out*W, kh*Ci] @ [kh*Ci, Co] matmul; this sweeps the contraction
threshold at the production point (2B=16 real+fake, T=17280 = one 48 kHz
training segment) for fwd, param-grads, and input-grads (the G adv+fm path).

Run on the chip: python scripts/probe_mpd.py
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

from rvc_tpu.models import discriminators as D
from rvc_tpu.train import losses as L

REPS = 20
B = 8
T = 17280  # cfg.train.segment_size at 48 kHz


def bench(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:4])  # warm + compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:4])
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    return best


def main():
    print(f"backend={jax.default_backend()} reps={REPS} B={B} T={T}")
    model = D.MultiPeriodDiscriminator()
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(B, T, 1)) * 0.1, jnp.bfloat16)
    y_hat = jnp.asarray(rng.normal(size=(B, T, 1)) * 0.1, jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), y, y_hat)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)

    def d_loss(p, yy, yh):
        yr, yg, _, _ = model.apply({"params": p}, yy, yh)
        return L.discriminator_loss(yr, yg)

    def g_adv_fm(p, yy, yh):
        yr, yg, fr, fg = model.apply({"params": p}, yy, yh)
        return L.generator_loss(yg) + L.feature_loss(fr, fg)

    ref = {}
    for thr in (10 ** 9, 160, 2560):
        D.MM_MIN_CONTRACT = thr

        def fwd(p, yy, yh, _t=thr):
            return model.apply({"params": p}, yy, yh)[0]

        fwd_j = jax.jit(fwd)
        dgrad = jax.jit(jax.grad(d_loss))
        ygrad = jax.jit(jax.grad(g_adv_fm, argnums=2))

        logits = np.asarray(fwd_j(params, y, y_hat)[0], np.float32)
        err = (0.0 if "fwd" not in ref else
               float(np.max(np.abs(logits - ref["fwd"]))))
        ref.setdefault("fwd", logits)
        t_f = bench(fwd_j, params, y, y_hat)
        t_d = bench(dgrad, params, y, y_hat)
        t_y = bench(ygrad, params, y, y_hat)
        label = "off (lax.conv)" if thr > 10 ** 6 else f"contract>={thr}"
        print(f"  {label:<16} fwd {t_f:6.3f}  d-grads {t_d:6.3f}  "
              f"yhat-grads {t_y:6.3f} ms  maxdiff={err:g}")


if __name__ == "__main__":
    main()
