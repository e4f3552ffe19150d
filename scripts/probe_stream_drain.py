"""Same-session A/B of the serving stream's drain modes (round-5 VERDICT #1).

Round 3 benched the sustained stream at 195x; round 4 at 149x with the
stream code byte-identical (git 3d47a50..fe0a0c1 shows only additive
changes to infer/pipeline.py). This probe settles where the time went by
measuring, interleaved in ONE process on ONE night:

  - tunnel weather: tiny-program RTT + 8 MB H2D/D2H bandwidth (round 2
    measured ~70 ms RTT / ~667 MB/s; the stream's economics change
    completely if the link degrades);
  - the r3/r4 in-loop blocking drain (sync_drain=True) vs the round-5
    threaded drain, alternating batches S,T,S,T,... so tunnel drift hits
    both equally.

Usage: python scripts/probe_stream_drain.py [n_pairs]
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

from bench import build_bench_pipeline


def tunnel_weather():
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    rtt = sorted(ts)[5] * 1e3
    a = np.random.default_rng(0).normal(size=(2 * 1024 * 1024,)).astype(
        np.float32)
    jax.block_until_ready(jnp.asarray(a))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        d = jax.block_until_ready(jnp.asarray(a))
        ts.append(time.perf_counter() - t0)
    h2d = 8.0 / sorted(ts)[2]
    g = jax.jit(lambda x: x * 2)
    d2 = g(d)
    np.asarray(d2)
    ts = []
    for _ in range(5):
        d2 = g(d)
        t0 = time.perf_counter()
        np.asarray(d2)
        ts.append(time.perf_counter() - t0)
    d2h = 8.0 / sorted(ts)[2]
    print(f"[weather] tiny RTT {rtt:.1f} ms | H2D {h2d:.0f} MB/s | "
          f"D2H {d2h:.0f} MB/s", flush=True)


def main(n_pairs=3):
    tunnel_weather()
    pipe, audio, kwargs, seconds, t16, tt = build_bench_pipeline()
    index_vectors = kwargs["index_vectors"]

    K = 12
    rng_np = np.random.default_rng(7)
    raw = [
        (0.4 * np.sin(2 * np.pi * (180 + 10 * i) * tt)
         + 0.05 * rng_np.normal(size=t16)).astype(np.float32)
        for i in range(K)
    ]

    def _prep(f):
        return np.pad(pipe._highpass(f), (pipe.t_pad, pipe.t_pad),
                      mode="reflect")

    vc_kwargs = dict(
        sid=0, index_vectors=index_vectors, index_rate=0.75,
        protect=0.33, pitch_shift=2, filter_radius=3,
    )

    # pipeline() warmup wires set_rmvpe + compiles the fused graph (same
    # order as bench_full_pipeline)
    t0 = time.perf_counter()
    out = pipe.pipeline(audio, **kwargs)
    print(f"[warmup pipeline] {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(out).all()
    # warmup: full-size batch (compiles the program, grows the allocator)
    t0 = time.perf_counter()
    outs = pipe.voice_conversion_fused_stream(
        raw, rng=jax.random.PRNGKey(3), prep=_prep, **vc_kwargs)
    print(f"[warmup stream] {time.perf_counter()-t0:.1f}s", flush=True)
    assert all(np.isfinite(o).all() for o in outs)

    results = {"sync": [], "thread": []}
    for p in range(n_pairs):
        for mode, sync in (("sync", True), ("thread", False)):
            t0 = time.perf_counter()
            outs = pipe.voice_conversion_fused_stream(
                raw, rng=jax.random.PRNGKey(100 + p), prep=_prep,
                sync_drain=sync, **vc_kwargs)
            dt = (time.perf_counter() - t0) / K
            results[mode].append(dt)
            print(f"[pair {p}] {mode:6s} {dt*1e3:7.1f} ms/file "
                  f"({seconds/dt:6.1f}x)", flush=True)

    for mode in ("sync", "thread"):
        med = sorted(results[mode])[len(results[mode]) // 2]
        print(f"{mode:6s} median {med*1e3:7.1f} ms/file ({seconds/med:6.1f}x) "
              f"spread {min(results[mode])*1e3:.1f}-"
              f"{max(results[mode])*1e3:.1f}", flush=True)
    tunnel_weather()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
