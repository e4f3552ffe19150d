"""Chip probe: RMVPE UNet 3x3 convs — lax.conv vs shifted-matmul form.

The r3 serving profile put the (bf16) DeepUnet conv stack at 7.7 ms per
10 s conversion, "bound by small-spatial tiling": the deep levels run at
T/32 x 4 spatial where XLA's conv tiling starves the MXU. Conv3x3
(predictors/rmvpe.py) reformulates wide-contraction convs as 9 shifted
[B*H*W, Ci] @ [Ci, Co] matmuls; this sweeps the channel threshold.

Run on the chip: python scripts/probe_rmvpe_conv.py
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

from rvc_tpu.predictors import rmvpe as R

REPS = 20
T = 1024  # frames (10 s at 16 kHz / hop 160, padded to a multiple of 32)


def main():
    print(f"backend={jax.default_backend()} reps={REPS} T={T}")
    model = R.E2EModel()
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, T, 128)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel)
    # serving dtype: bf16 params + mel (salience head stays in the model)
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)
    melb = mel.astype(jnp.bfloat16)

    ref = None
    for min_ch in (10 ** 9, 128, 64):
        R.MM_MIN_CH = min_ch

        def run(v, m, _tag=min_ch):
            return model.apply(v, m)

        fn = jax.jit(run)
        out = np.asarray(fn(vb, melb)[0, ::257, ::61])  # warm + correctness
        err = 0.0 if ref is None else float(
            np.max(np.abs(out.astype(np.float32) - ref)))
        if ref is None:
            ref = out.astype(np.float32)
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = fn(vb, melb)
        np.asarray(y[0, :2, :2])  # programs run in order: last sync bounds all
        ms = (time.perf_counter() - t0) / REPS * 1e3
        label = "off (lax.conv)" if min_ch > 512 else f"min_ch={min_ch}"
        print(f"  {label:<16} {ms:7.3f} ms/salience  maxdiff={err:g}")


if __name__ == "__main__":
    main()
