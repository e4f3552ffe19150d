"""Per-HLO-op device-time profile of the serving/train hot paths.

Captures a jax.profiler device trace of the fused conversion program (the
bench.py serving path: RMVPE f0 + retrieval + protect + flagship 48k NSF
synthesis) and/or the fused GAN train step, then aggregates per-op device
time from the xplane via xprof's hlo_stats converter.

Usage:
    python scripts/profile_ops.py [infer|train] [--top N]

Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the xprof protos
(set automatically below, before any proto import).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
# share bench.py's persistent compile cache (repo-local, warmed every round)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_bench_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def _log(msg: str) -> None:
    print(f"[profile] {msg}", file=sys.stderr, flush=True)


def summarize_xplane(trace_dir: str, top: int = 40) -> list[dict]:
    """Aggregate per-op device time (us) from a jax.profiler trace dir."""
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = [c.get("v") for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    # keys of interest: category, hlo_op_name, occurrences, total_time (us)
    tkey = next(
        (c for c in cols if "total" in c and "time" in c), "total_time"
    )
    rows.sort(key=lambda r: -(r.get(tkey) or 0))
    out = []
    for r in rows[:top]:
        # default None fields (xprof column names/values vary by version)
        out.append({
            "op": (r.get("hlo_op_name") or "")[:70],
            "category": r.get("category") or "?",
            "n": r.get("occurrences") or 0,
            "total_us": round(float(r.get(tkey) or 0), 1),
        })
    by_cat: dict[str, float] = {}
    for r in rows:
        by_cat[r.get("category") or "?"] = by_cat.get(
            r.get("category") or "?", 0.0
        ) + float(r.get(tkey) or 0)
    total = sum(by_cat.values())
    print(f"\n== device time by category (total {total/1e3:.1f} ms) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    print(f"\n== top {top} ops ==")
    for r in out:
        print(f"  {r['total_us']/1e3:9.2f} ms  x{r['n']:<5} "
              f"{r['category']:<22} {r['op']}")
    return out


def profile_infer(reps: int = 3, top: int = 40) -> None:
    import jax
    import jax.numpy as jnp
    import bench

    cfg_mod = __import__("rvc_tpu.configs", fromlist=["get_config"])
    from rvc_tpu.embedders import FlaxHubert, HubertConfig
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    cfg = cfg_mod.get_config(48000)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    seconds, t16 = 10.0, 160000
    hub_params = bench._abstract_init(
        lambda k, a: hubert.init(k, a), key, jnp.zeros((1, 3200), jnp.float32)
    )["params"]
    tf0 = 64
    synth_vars = bench._abstract_init(
        lambda rngs, *a: model.init(rngs, *a),
        {"params": key, "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, tf0, 768)), jnp.asarray([tf0], jnp.int32),
        jnp.full((1, tf0), 100, jnp.int32),
        jnp.full((1, tf0), 220.0, jnp.float32),
        jnp.zeros((1, tf0, cfg.data.spec_channels)),
        jnp.asarray([tf0], jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    rmvpe_model = E2EModel()
    rmvpe_vars = bench._abstract_init(
        lambda k, m: rmvpe_model.init(k, m), key, jnp.zeros((1, 32, 128))
    )
    rmvpe = RMVPE(rmvpe_vars["params"], rmvpe_vars.get("batch_stats", {}),
                  model=rmvpe_model)
    pipe = Pipeline(
        48000, model, synth_vars["params"], hubert, hub_params,
        PipelineConfig(), upsample_factor=cfg.upsample_factor,
        precision="bf16",
    )
    index_vectors = jax.block_until_ready(jnp.asarray(
        rng.normal(size=(65536, 768)).astype(np.float32)))
    tt = np.arange(t16) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * tt)
             + 0.05 * rng.normal(size=t16)).astype(np.float32)
    kwargs = dict(sid=0, pitch_shift=2, f0_method="rmvpe",
                  index_vectors=index_vectors, index_rate=0.75,
                  protect=0.33, filter_radius=3,
                  predictors={"rmvpe": rmvpe.infer_from_audio})
    t0 = time.perf_counter()
    out = pipe.pipeline(audio, **kwargs)
    _log(f"warmup {time.perf_counter()-t0:.1f}s")
    assert np.isfinite(out).all()

    trace_dir = tempfile.mkdtemp(prefix="rvc_prof_infer_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(reps):
        pipe.pipeline(audio, **kwargs)
    jax.profiler.stop_trace()
    _log(f"traced {reps} conversions -> {trace_dir}")
    print(f"\n### fused conversion, {reps} reps "
          f"(divide ms by {reps} for per-conversion)")
    summarize_xplane(trace_dir, top)


def profile_train(reps: int = 3, top: int = 40) -> None:
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.train.optimizers import make_optimizer
    from rvc_tpu.train.step import create_train_state, make_train_step

    trace_dir = tempfile.mkdtemp(prefix="rvc_prof_train_")
    cfg = get_config(48000)
    model_g = Synthesizer.from_config(cfg)
    model_d = MultiPeriodDiscriminator()
    B, T = 8, 400
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
    init_fn = jax.jit(
        lambda r, b: create_train_state(r, cfg, model_g, model_d, tx_g,
                                        tx_d, b))
    state = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params_g)
    step = jax.jit(
        make_train_step(cfg, model_g, model_d, tx_g, tx_d,
                        steps_per_epoch=100),
        donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss_disc"])
    _log(f"train warmup {time.perf_counter()-t0:.1f}s")
    jax.profiler.start_trace(trace_dir)
    for i in range(reps):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    np.asarray(metrics["loss_disc"])
    jax.profiler.stop_trace()
    print(f"\n### fused train step, {reps} reps "
          f"(divide ms by {reps} for per-step)")
    summarize_xplane(trace_dir, top)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["infer", "train"], nargs="?",
                    default="infer")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if a.mode == "infer":
        profile_infer(a.reps, a.top)
    else:
        profile_train(a.reps, a.top)
