"""A/B probe: fused_mrf per-tap dots vs CONCAT_TAPS long-contraction dots.

The r3 train/serve profiles put the three fused-MRF stage kernels at
~13.7 ms/conversion against a ~5.7 ms pure-dot bound; the gap is per-tap
overhead (many short [fc, fc] dots + their accumulations). The CONCAT_TAPS
variant (ops/resblock_pallas.py) regroups each conv into one dot per <=6
taps over the concatenated shifted views — same math (interpret-mode
equality in tests/test_resblock_pallas.py), different MXU shape.

Times both variants at the 48k flagship's three fused decoder stages for a
10 s conversion (bf16 serving dtypes), honest sync via np.asarray. Run on
the chip: python scripts/probe_mrf_taps.py
"""

import sys
import time

sys.path.insert(0, ".")  # run from the repo root

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from rvc_tpu.ops import resblock_pallas as rp  # noqa: E402

DIL = (1, 3, 5)
KS = (3, 7, 11)
# (channels, T) of the fused stages for ~10 s of 48 kHz audio
STAGES = [(128, 120_000), (64, 240_000), (32, 480_000)]
REPS = 20


def make_inputs(c, t, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(1, t, c)) * 0.3, jnp.bfloat16)
    chains = []
    for k in KS:
        chains.append(tuple(
            [jnp.asarray(rng.normal(size=(k, c, c)) * 0.05, jnp.float32)
             for _ in DIL] if i % 2 == 0 else
            [jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
             for _ in DIL]
            for i in range(4)
        ))
    return x, tuple(chains)


def bench(fn, x, chains):
    # honest sync through a TINY fetch: slicing the kernel output forces
    # execution to finish, but moves 256 bytes instead of the ~30 MB
    # signal, so the tunnel's D2H bandwidth stays out of the measurement.
    def sync(y):
        return np.asarray(y[0, :8, :8])

    sync(fn(x, chains))  # warm (compile both programs)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(x, chains))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def _chained_fn(variant_tag, tile=1024):
    # chain CALLS dependent applications so the tunnel round trip
    # amortizes to ~1/CALLS of the wall reading (the kernel output
    # shape matches its input, so it self-composes)
    CALLS = 10

    def chained(x_, ch_, _v=variant_tag, _t=tile):
        y = x_
        for _ in range(CALLS):
            y = rp.fused_mrf(y, ch_, KS, DIL, tile=_t)
        return y

    return jax.jit(chained), CALLS


def main():
    print(f"backend={jax.default_backend()} reps={REPS}")
    defaults = (rp.CONCAT_TAPS, rp.ROLL_BF16, rp.PLTPU_ROLL)
    # (CONCAT_TAPS, ROLL_BF16, PLTPU_ROLL, tile)
    variants = [
        ("base", (False, False, False, 1024)),
        ("roll_bf16", (False, True, False, 1024)),
        ("bf16+pltpu", (False, True, True, 1024)),
        ("bf16@t2048", (False, True, False, 2048)),
    ]
    total = {name: 0.0 for name, _ in variants}
    for c, t in STAGES:
        x, chains = make_inputs(c, t, seed=c)
        wb = rp.mrf_weight_bytes(c, t, KS, DIL) // 2  # bf16 bank
        print(f"C={c:<4} T={t:<7} bank={wb / 2**20:.2f}MB")
        ref_probe = None
        for name, (concat, rbf16, proll, tile) in variants:
            rp.CONCAT_TAPS, rp.ROLL_BF16, rp.PLTPU_ROLL = concat, rbf16, proll
            fn, calls = _chained_fn(name, tile)
            try:
                # correctness probe: a strided sample of the chained output
                # must match the baseline bit-for-bit (all variants are
                # data-movement-only reorganizations)
                probe = np.asarray(fn(x, chains)[0, ::4999, :])
                err = 0.0 if ref_probe is None else float(
                    np.max(np.abs(probe.astype(np.float32)
                                  - ref_probe.astype(np.float32))))
                if ref_probe is None:
                    ref_probe = probe
                ms = bench(fn, x, chains) / calls
            except Exception as e:  # VMEM blowout / Mosaic crash: keep going
                print(f"  {name:<11} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            finally:
                rp.CONCAT_TAPS, rp.ROLL_BF16, rp.PLTPU_ROLL = defaults
            total[name] += ms
            print(f"  {name:<11} {ms:7.3f} ms/call  maxdiff={err:g}")
    print("TOTAL " + "  ".join(f"{n}={v:.3f}" for n, v in total.items()))


if __name__ == "__main__":
    main()
