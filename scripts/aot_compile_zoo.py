"""AOT TPU compile-check of the discriminator zoo.

Every DISCRIMINATOR_REGISTRY entry (plus the default MPD) is compiled
ahead-of-time for a v5e device — forward AND backward at the real training
segment length — using the locally bundled libtpu compiler via
jax.experimental.topologies. No TPU attachment or tunnel is needed, so this
validates XLA lowering (dilated complex-STFT convs, DWT pyramids, spectral
norm power iteration, CQT matmuls) of adversaries a user can select with
--discriminators before they ever hit real hardware.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/aot_compile_zoo.py
Optional: --only msd,msstft --batch 2 --segment 17280
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tpu_mesh():
    """Smallest topology this libtpu accepts is a 2x2 host (4 chips);
    everything is replicated so the compiled program per chip is the
    single-chip program we want to validate."""
    from jax.experimental import topologies

    errs = []
    for name in ("v5e:2x2", "v5e:2x2x1"):
        try:
            topo = topologies.get_topology_desc(name, platform="tpu")
            return topologies.make_mesh(topo, (4,), ("dp",))
        except Exception as e:  # name spelling varies across PJRT versions
            errs.append(f"{name}: {type(e).__name__}")
    raise RuntimeError(f"no topology name accepted: {errs}")


def check_one(name: str, batch: int, segment: int, mesh) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rvc_tpu.models.custom_discriminators import build_discriminator

    model = build_discriminator([name])
    y = jax.ShapeDtypeStruct((batch, segment, 1), jnp.float32)

    def init_shape():
        return jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, segment, 1)),
                               jnp.zeros((1, segment, 1))))

    vs = init_shape()

    def loss_fn(params, yr, yg):
        rs, gs, fr, fg = model.apply(params, yr, yg)
        # LSGAN D loss + an FM-style term so fmaps join the backward
        l = sum(jnp.mean((1.0 - r.astype(jnp.float32)) ** 2)
                + jnp.mean(g.astype(jnp.float32) ** 2)
                for r, g in zip(rs, gs))
        l += sum(jnp.mean(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32)))
                 for fa, fb in zip(fr, fg) for a, b in zip(fa, fb))
        return l

    repl = NamedSharding(mesh, P())
    grads = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(jax.tree.map(lambda _: repl, vs), repl, repl),
        out_shardings=jax.tree.map(lambda _: repl, vs),
    )
    t0 = time.time()
    compiled = grads.lower(vs, y, y).compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    mib = 1024.0 ** 2

    def g(n):
        v = getattr(ma, n, None)
        return round(v / mib, 1) if v is not None else None

    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(vs))
    return {
        "compile_s": round(dt, 1),
        "params_m": round(n_params / 1e6, 2),
        "temp_mib": g("temp_size_in_bytes"),
        "code_mib": g("generated_code_size_in_bytes"),
    }


import numpy as np  # noqa: E402  (used in check_one)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--segment", type=int, default=17280)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from rvc_tpu.models.custom_discriminators import DISCRIMINATOR_REGISTRY

    names = (args.only.split(",") if args.only
             else ["mpd"] + sorted(DISCRIMINATOR_REGISTRY))
    mesh = tpu_mesh()
    out = {}
    for n in names:
        try:
            out[n] = check_one(n.strip(), args.batch, args.segment, mesh)
        except Exception as e:
            out[n] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({n: out[n]}), flush=True)
    ok = [n for n, r in out.items() if "error" not in r]
    bad = [n for n, r in out.items() if "error" in r]
    print(json.dumps({"ok": ok, "failed": bad}))


if __name__ == "__main__":
    main()
