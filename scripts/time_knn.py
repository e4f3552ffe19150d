"""On-device k-NN timing: Pallas streaming kernel vs the XLA dense/tiled
dispatch (VERDICT r2 weak #1 settlement).

Run on the real TPU:  python scripts/time_knn.py
Sizes follow production retrieval: D=768 hubert features, T~1000 query
frames (10 s of audio), N = 1e4 (kmeans-compressed index), 65536, 2e5
(large uncompressed index). Reports median wall ms per call (device-timed
via block_until_ready around a repeat loop, so tunnel RTT amortizes).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, *args, reps: int = 20, inner: int = 5):
    # force a (tiny) D2H fetch each batch: through the remote tunnel,
    # block_until_ready alone can return before execution retires
    out = fn(*args)
    np.asarray(out[0])  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(out[0])
        times.append((time.perf_counter() - t0) / inner)
    return sorted(times)[len(times) // 2] * 1e3, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rvc_tpu.ops.retrieval import _search_dispatch, knn_search_tiled
    from rvc_tpu.ops.retrieval_pallas import knn_search_pallas

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    T, D, K = 1000, 768, 8
    results = []
    for n in (10_000, 65_536, 200_000):
        q = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)

        xla_fn = jax.jit(lambda q, v: _search_dispatch(q, v, K))
        tiled_fn = jax.jit(lambda q, v: knn_search_tiled(q, v, K, tile=4096))

        ms_xla, out_x = bench(xla_fn, q, v)
        ms_tiled, _ = bench(tiled_fn, q, v)
        # pallas: T=1000 queries + tile rows of V + [T, tile] scores must fit
        # the 16 MB scoped-VMEM budget — sweep the tile down to find its best
        ms_pallas, p_tile, d_ok = float("nan"), None, False
        for tile in (2048, 1024, 512):
            pallas_fn = jax.jit(
                lambda q, v, t=tile: knn_search_pallas(q, v, K, tile=t))
            try:
                ms_t, out_p = bench(pallas_fn, q, v)
            except Exception as e:
                d_ok = f"tile{tile}: {type(e).__name__}"
                continue
            if not (ms_t >= ms_pallas):  # nan-safe min
                ms_pallas, p_tile = ms_t, tile
                d_ok = np.allclose(np.asarray(out_x[0]), np.asarray(out_p[0]),
                                   rtol=1e-4, atol=1e-4)
        print(f"N={n:>7}: dispatch {ms_xla:7.2f} ms | tiled {ms_tiled:7.2f} "
              f"ms | pallas {ms_pallas:7.2f} ms (tile={p_tile}) | "
              f"match={d_ok}")
        results.append((n, ms_xla, ms_tiled, ms_pallas))
    print("\npaste into docs/PERFORMANCE.md (k-NN settlement)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
