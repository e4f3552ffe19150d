"""Benchmark: end-to-end voice conversion + training throughput on one chip.

Primary metric: REAL end-to-end conversion through the production Pipeline —
RMVPE f0 (bucketed jit), faiss-equivalent retrieval blend (index_rate 0.75,
65k vectors), protect blend, HuBERT content encoder, flagship 48k
NSF-HiFi-GAN — converting 10 s of 16 kHz audio, including all host DSP
(high-pass, windowing, quantization). Weights are random (structurally
identical compute; the env has no pretrained checkpoints).

Also measured into the same JSON line:
  - graph_xrt: the jitted HuBERT+synthesizer graph alone (round-1 metric,
    kept for continuity)
  - train_steps_per_sec / train_audio_sec_per_sec: full-size 48k fused GAN
    train step, batch 8 (the second BASELINE.md north star)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline divides by the driver-defined north star of 50x real-time per
chip (BASELINE.json; the reference publishes no benchmark numbers —
BASELINE.md documents this).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _abstract_init(init_fn, *args):
    """Materialize parameters from eval_shape (no init compile): the bench
    measures throughput, not quality, so parameter values are arbitrary."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(0)

    def make(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.asarray(
                rng.normal(size=s.shape, scale=0.02), dtype=s.dtype
            )
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree.map(make, shapes)


def build_bench_pipeline():
    """Construct the production serving pipeline + 10 s input + kwargs used
    by the bench (shared with scripts/probe_stream_drain.py so probes and
    the bench measure the identical configuration). Returns
    (pipe, audio, kwargs, seconds, t16, tt)."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.embedders import FlaxHubert, HubertConfig
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    cfg = get_config(48000)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())

    seconds = 10.0
    t16 = int(seconds * 16000)
    t_frames = 64  # init-shape only; infer re-traces per real length

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    audio16_probe = jnp.zeros((1, 3200), jnp.float32)
    hub_params = _abstract_init(
        lambda k, a: hubert.init(k, a), key, audio16_probe
    )["params"]
    synth_vars = _abstract_init(
        lambda rngs, *a: model.init(rngs, *a),
        {"params": key, "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t_frames, 768)),
        jnp.asarray([t_frames], jnp.int32),
        jnp.full((1, t_frames), 100, jnp.int32),
        jnp.full((1, t_frames), 220.0, jnp.float32),
        jnp.zeros((1, t_frames, cfg.data.spec_channels)),
        jnp.asarray([t_frames], jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )

    rmvpe_model = E2EModel()
    rmvpe_vars = _abstract_init(
        lambda k, m: rmvpe_model.init(k, m), key, jnp.zeros((1, 32, 128))
    )
    rmvpe = RMVPE(rmvpe_vars["params"], rmvpe_vars.get("batch_stats", {}),
                  model=rmvpe_model)

    pipe = Pipeline(
        48000, model, synth_vars["params"], hubert, hub_params,
        PipelineConfig(), upsample_factor=cfg.upsample_factor,
        precision="bf16",  # production default (reference runs fp16)
    )
    # index stays resident on device (as VoiceConverter._load_index does) —
    # re-uploading 200 MB per conversion is not part of steady-state serving
    index_vectors = jax.block_until_ready(jnp.asarray(
        rng.normal(size=(65536, 768)).astype(np.float32)
    ))
    tt = np.arange(t16) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * tt)
             + 0.05 * rng.normal(size=t16)).astype(np.float32)

    kwargs = dict(
        sid=0, pitch_shift=2, f0_method="rmvpe",
        index_vectors=index_vectors, index_rate=0.75,
        protect=0.33, filter_radius=3,
        predictors={"rmvpe": rmvpe.infer_from_audio},
    )
    return pipe, audio, kwargs, seconds, t16, tt


def measure_link() -> dict:
    """Tunnel weather: tiny-program RTT + D2H bandwidth. The serving stream
    is transfer-bound whenever bytes/bandwidth exceeds device compute
    (~1.3 MB/file; round 2 measured ~667 MB/s, round 5 measured 24-33 MB/s
    on the same code), so the bench records the link state next to every
    headline — a 149x and a 195x night differ here, not in the code."""
    import jax
    import jax.numpy as jnp

    rec = {}
    try:
        f = jax.jit(lambda x: x + 1)
        x = jnp.zeros((8,), jnp.float32)
        np.asarray(f(x))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        rec["link_rtt_ms"] = round(sorted(ts)[3] * 1e3, 1)
        a = np.zeros(1024 * 1024, np.float32)  # 4 MB
        d = jax.block_until_ready(jnp.asarray(a))
        g = jax.jit(lambda x: x * 2)
        np.asarray(g(d))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(d))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1] - min(rec["link_rtt_ms"] / 1e3, sorted(ts)[1] / 2)
        rec["link_d2h_mbps"] = round(4.0 / max(dt, 1e-4), 0)
    except Exception:
        pass  # weather is context, never a failure
    return rec


def bench_full_pipeline() -> dict:
    """10 s conversion through infer.Pipeline with RMVPE + retrieval."""
    import jax
    import numpy as np  # noqa: F811 (section children re-import)

    pipe, audio, kwargs, seconds, t16, tt = build_bench_pipeline()
    index_vectors = kwargs["index_vectors"]

    t0 = time.perf_counter()
    out = pipe.pipeline(audio, **kwargs)  # compile warmup
    _log(f"pipeline warmup {time.perf_counter()-t0:.1f}s")
    assert np.isfinite(out).all()

    # median of singles: the remote tunnel's latency jitters run-to-run,
    # and a mean lets one slow round trip skew the headline
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = pipe.pipeline(audio, **kwargs)
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[len(times) // 2]
    _log(f"pipeline steady {elapsed:.2f}s per 10s conversion "
         f"(median of {len(times)}; spread {min(times):.2f}-{max(times):.2f})")
    record = {"full_xrt": seconds / elapsed, "out_len": int(len(out))}
    record.update(measure_link())
    if "link_rtt_ms" in record:
        _log(f"link weather: rtt {record['link_rtt_ms']} ms, "
             f"d2h {record.get('link_d2h_mbps', '?')} MB/s")

    # Serving throughput: a sustained stream of files with dispatch-ahead
    # (depth 2). The latency number above pays a full host<->device round
    # trip per file (~70 ms through this remote-attached tunnel; ~1 ms
    # co-located); the stream overlaps upload/download with device compute,
    # which is how a conversion server runs. Reuses the already-compiled
    # single-file program — no extra warmup cost.
    try:
        import jax

        K = 12
        rng_np = np.random.default_rng(7)
        raw = [
            (0.4 * np.sin(2 * np.pi * (180 + 10 * i) * tt)
             + 0.05 * rng_np.normal(size=t16)).astype(np.float32)
            for i in range(K)
        ]

        def _prep(f):  # the host DSP every conversion pays
            return np.pad(pipe._highpass(f), (pipe.t_pad, pipe.t_pad),
                          mode="reflect")

        vc_kwargs = dict(
            sid=0, index_vectors=index_vectors, index_rate=0.75,
            protect=0.33, pitch_shift=2, filter_radius=3,
        )
        # warmup (same program as above): a FULL-size batch, so the first
        # timed batch doesn't pay one-time costs the steady state never
        # sees again (allocator growth for `depth` in-flight buffers, the
        # tunnel's transfer-path warmup) — measured 65x vs 146/190x on the
        # first timed batch when warming with only 2 files.
        t0 = time.perf_counter()
        outs = pipe.voice_conversion_fused_stream(
            raw, rng=jax.random.PRNGKey(3), prep=_prep, **vc_kwargs,
        )
        cold_dt = (time.perf_counter() - t0) / K
        assert all(np.isfinite(o).all() for o in outs)
        # keep the cold view too: first-batch throughput including the
        # one-time costs (allocator growth, transfer-path warmup)
        record["stream_xrt_cold"] = round(seconds / cold_dt, 1)
        # timed region includes the per-file host DSP (high-pass + pad),
        # applied inside the dispatch loop so it overlaps device compute —
        # the shape of a real conversion server. Median of 3 batches: the
        # tunnel's compile/transfer service stalls unpredictably (identical
        # warm runs have varied 2x), and a single batch lets one stall set
        # the headline.
        dts = []
        for bi in range(3):
            t0 = time.perf_counter()
            outs = pipe.voice_conversion_fused_stream(
                raw, rng=jax.random.PRNGKey(4 + bi), prep=_prep, **vc_kwargs
            )
            assert len(outs) == K
            dts.append((time.perf_counter() - t0) / K)
        dt = sorted(dts)[1]
        record["stream_xrt"] = seconds / dt
        record["stream_ms_per_file"] = round(dt * 1e3, 1)
        record["stream_batches_xrt"] = [round(seconds / d, 1) for d in dts]
        _log(f"sustained stream {dt:.3f}s per 10s conversion "
             f"(K={K}, median of 3 batches {min(dts):.3f}-{max(dts):.3f})")
    except Exception as e:  # throughput is auxiliary; never sink the bench
        record["stream_error"] = f"{type(e).__name__}: {e}"[:200]
    return record


def bench_graph_only() -> float:
    """Round-1 continuity metric: one jitted HuBERT+synthesizer graph."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.embedders import FlaxHubert, HubertConfig
    from rvc_tpu.models.synthesizer import Synthesizer

    cfg = get_config(48000)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())

    seconds = 10.0
    t16 = int(seconds * 16000)
    t_frames = 2 * ((t16 - 400) // 320 + 1)

    rng = np.random.default_rng(0)
    audio16 = jnp.asarray(rng.normal(size=(1, t16)) * 0.1, jnp.float32)
    pitch = jnp.full((1, t_frames), 100, jnp.int32)
    pitchf = jnp.full((1, t_frames), 220.0, jnp.float32)
    lengths = jnp.asarray([t_frames], jnp.int32)
    sid = jnp.asarray([0], jnp.int32)

    key = jax.random.PRNGKey(0)
    hub_params = _abstract_init(
        lambda k, a: hubert.init(k, a), key, audio16[:, :3200]
    )["params"]
    synth_vars = _abstract_init(
        lambda rngs, *a: model.init(rngs, *a),
        {"params": key, "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t_frames, 768)), lengths, pitch, pitchf,
        jnp.zeros((1, t_frames, cfg.data.spec_channels)), lengths, sid,
    )
    infer = type(model).infer

    @jax.jit
    def convert(hub_params, synth_vars, audio16, pitch, pitchf, lengths, sid, rng):
        feats = hubert.apply({"params": hub_params}, audio16)
        feats = jnp.repeat(feats, 2, axis=1)[:, :t_frames]
        audio, _ = model.apply(
            synth_vars, feats, lengths, pitch, pitchf, sid,
            method=infer, rngs={"noise": rng},
        )
        return audio

    args = (hub_params, synth_vars, audio16, pitch, pitchf, lengths, sid,
            jax.random.PRNGKey(2))
    np.asarray(convert(*args)[0, 0, 0])  # compile + real sync
    # NOTE: device execution is serial, so fetching the LAST iteration's
    # output forces all prior dispatches to complete — an honest amortized
    # throughput measure even where block_until_ready returns early (the
    # remote-attached backend here).
    n_runs = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(n_runs):
        out = convert(*args)
    np.asarray(out[0, 0, 0])
    return seconds / ((time.perf_counter() - t0) / n_runs)


def bench_train(batch_size: int = 8, frames: int = 400) -> dict:
    """Full-size 48k fused GAN train step throughput (north star #2)."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.train.optimizers import make_optimizer
    from rvc_tpu.train.step import create_train_state, make_train_step

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
    init_fn = jax.jit(
        lambda r, b: create_train_state(r, cfg, model_g, model_d, tx_g, tx_d, b)
    )
    state = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params_g)
    step = jax.jit(
        make_train_step(cfg, model_g, model_d, tx_g, tx_d, steps_per_epoch=100),
        donate_argnums=(0,),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss_disc"])  # compile + real sync (see note above)
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    np.asarray(metrics["loss_disc"])  # steps chain through state: full sync
    dt = (time.perf_counter() - t0) / n_steps
    rec = {
        "train_steps_per_sec": 1.0 / dt,
        "train_audio_sec_per_sec": B * cfg.train.segment_size / 48000 / dt,
        "train_ms_per_step": dt * 1e3,
    }
    # MFU: XLA's own FLOP count for the fused step over the v5e bf16 paper
    # peak (197 TFLOP/s) — the cross-round comparable the wall numbers
    # aren't (VERDICT r4 #3). Demonstrated-matmul MFU (96.5 TFLOP/s
    # sustained on a 4096^3 bf16 matmul) is ~2x this figure.
    try:
        compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            rec["train_mfu_pct"] = flops / dt / 197e12 * 100.0
    except Exception:
        pass  # cost analysis is metadata; never sink the train number
    return rec


def _pipeline_section() -> None:
    """Child-process entry: pipeline bench -> one tagged JSON line."""
    _configure_cache()
    full = bench_full_pipeline()
    print("SECTION_JSON " + json.dumps(full), flush=True)


def _train_section(with_b16: bool) -> None:
    """Child-process entry: train bench (b8, optionally b16)."""
    _configure_cache()
    rec = {k: round(v, 3) for k, v in bench_train().items()}
    print("SECTION_JSON " + json.dumps(rec), flush=True)  # b8 survives a
    if with_b16:                                          # later b16 fault
        b16 = bench_train(batch_size=16)
        rec["train_steps_per_sec_b16"] = round(b16["train_steps_per_sec"], 3)
        rec["train_audio_sec_per_sec_b16"] = round(
            b16["train_audio_sec_per_sec"], 3)
        print("SECTION_JSON " + json.dumps(rec), flush=True)


def _graph_section() -> None:
    """Child-process entry: graph-only bench."""
    _configure_cache()
    print("SECTION_JSON " + json.dumps({"graph_xrt": round(bench_graph_only(), 2)}),
          flush=True)


def _all_section() -> None:
    """Child-process entry: every section in ONE process/device client.

    The tunnel's stall cost is per-client first-big-program-load (measured
    2026-08-21: a warm pipeline took 21 min to load its first program, then
    the full train section ran in 285 s in the SAME process). One child
    therefore amortizes one stall across all three sections. Tagged lines
    flush after each section, so a later kernel fault or parent timeout
    keeps everything already printed."""
    _configure_cache()
    full = bench_full_pipeline()
    print("SECTION_JSON " + json.dumps(full), flush=True)
    rec = {k: round(v, 3) for k, v in bench_train().items()}
    print("SECTION_JSON " + json.dumps(rec), flush=True)
    b16 = bench_train(batch_size=16)
    print("SECTION_JSON " + json.dumps({
        "train_steps_per_sec_b16": round(b16["train_steps_per_sec"], 3),
        "train_audio_sec_per_sec_b16": round(b16["train_audio_sec_per_sec"], 3),
    }), flush=True)
    print("SECTION_JSON " + json.dumps(
        {"graph_xrt": round(bench_graph_only(), 2)}), flush=True)


def _configure_cache() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _run_section(name: str, args: list, timeout_s: float):
    """Run one bench section in a CHILD process; return (dict|None, error).

    Section isolation is a hard requirement since round 3: a TPU kernel
    fault kills the whole worker process, and an in-process train fault ate
    the train AND graph numbers of that round's bench. A child crash now
    costs only its own section; the tagged-line protocol keeps any
    partial result the child managed to print (e.g. the b8 train number
    when the b16 variant faults). The child inherits stderr for progress
    logs; the parent never imports jax, so its final JSON line always
    prints."""
    import subprocess

    t0 = time.perf_counter()
    stdout, rc, err = "", 0, None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name]
            + args,
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            timeout=timeout_s,
        )
        stdout, rc = proc.stdout or "", proc.returncode
    except subprocess.TimeoutExpired as e:
        # salvage tagged lines the child flushed before the timeout (the
        # combined section prints after each sub-bench exactly for this)
        out = e.stdout or b""
        stdout = out.decode(errors="replace") if isinstance(out, bytes) else out
        err = f"section {name} timed out after {timeout_s:.0f}s"
    result = None
    for line in stdout.splitlines():
        if line.startswith("SECTION_JSON "):
            # merge in print order: later sections add keys, re-prints of
            # the same section overwrite with the fuller record
            result = {**(result or {}),
                      **json.loads(line[len("SECTION_JSON "):])}
    _log(f"section {name} rc={rc} {time.perf_counter()-t0:.1f}s"
         + (f" ({err})" if err else ""))
    if result is None:
        tail = stdout.strip().splitlines()
        return None, err or (f"section {name} rc={rc}: "
                             + " | ".join(tail[-2:]))[:250]
    if err:
        result.setdefault("partial_error", err)
    elif rc != 0:
        result.setdefault("partial_error", f"section {name} rc={rc}")
    return result, None


def main() -> None:
    # Section dispatch: `bench.py --section <name>` runs one section
    # in-process (invoked by the parent below as a child).
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        name = sys.argv[2]
        if name == "pipeline":
            _pipeline_section()
        elif name == "train":
            _train_section(with_b16="--b16" in sys.argv)
        elif name == "graph":
            _graph_section()
        elif name == "all":
            _all_section()
        else:
            raise SystemExit(f"unknown section {name}")
        return

    # Parent: pure orchestration, no jax import — a chip fault in any
    # section can never prevent the final JSON line from printing.
    budget_s = float(os.environ.get("RVC_BENCH_BUDGET_S", "480"))
    start = time.perf_counter()

    def left() -> float:
        return budget_s - (time.perf_counter() - start)

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_bench_cache")
    last_good_path = os.path.join(cache_dir, "last_good.json")
    hard_cap = float(os.environ.get("RVC_BENCH_HARD_CAP_S",
                                    str(max(600.0, budget_s + 120.0))))

    record = {}
    full = None        # pipeline result (carries full_xrt / stream_xrt)
    have_train = False
    have_graph = False

    def _absorb_pipeline(rec: dict) -> None:
        nonlocal full
        full = rec
        record.pop("pipeline_error", None)
        record.pop("last_good", None)
        record.update({k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in rec.items()
                       if k not in ("full_xrt", "stream_xrt",
                                    "train_steps_per_sec",
                                    "train_audio_sec_per_sec",
                                    "train_steps_per_sec_b16",
                                    "train_audio_sec_per_sec_b16",
                                    "graph_xrt")})
        record["latency_xrt"] = round(rec["full_xrt"], 2)

    # Combined attempt first: ONE child = one device client = one possible
    # first-big-load stall amortized over every number (measured 2026-08-21:
    # a warm pipeline's first program load took 21 min in a stall window,
    # after which the entire train section ran in 285 s in the same
    # process). Tagged lines flush per sub-bench, so a timeout or kernel
    # fault keeps whatever completed; anything missing falls back to the
    # per-section children below (round-3 fault isolation preserved).
    # cap covers the measured worst case: 1267 s stalled pipeline + 285 s
    # train + b16 + graph ≈ 1712 s; tagged-line salvage keeps whatever
    # finished if even that is exceeded
    all_cap = float(os.environ.get("RVC_BENCH_ALL_CAP_S", "1800"))
    if os.environ.get("RVC_BENCH_NO_ALL", "") != "1":
        arec, aerr = _run_section("all", [], all_cap)
        if arec:
            if "full_xrt" in arec:
                _absorb_pipeline(arec)
            if "train_steps_per_sec" in arec:
                have_train = True
                record.update({k: v for k, v in arec.items()
                               if k.startswith("train_")})
            if "graph_xrt" in arec:
                have_graph = True
                record["graph_xrt"] = arec["graph_xrt"]
        if full is None or not have_train:
            _log(f"combined section incomplete ({aerr}); per-section fallback")

    if full is None:
        p1, err = _run_section("pipeline", [], min(hard_cap, 480.0))
        if p1 is None:
            # stall windows last minutes; one retry gives the run a second
            # window, and a still-stalled service fails it quickly enough
            # to leave budget for the rest
            _log(f"pipeline attempt failed ({err}); retrying once")
            p1, err2 = _run_section("pipeline", [], min(hard_cap, 330.0))
            err = f"{err}; retry: {err2}" if p1 is None else None
        if p1 is not None:
            _absorb_pipeline(p1)
            _log(f"pipeline section done ({left():.0f}s budget left)")
        else:
            # honest failure for the headline (value 0, error attached) —
            # but a pipeline stall must not eat the train/graph numbers
            # (the inverse of round 3, where section isolation saved the
            # pipeline numbers from a train-step fault); fall through.
            record["pipeline_error"] = err
            try:
                with open(last_good_path) as f:
                    record["last_good"] = json.load(f)
            except Exception:
                pass

    # train-step throughput is the second north star — run it even deep
    # over budget; floor of 300 s so a stalled pipeline can't squeeze it
    # below one honest warm attempt.
    if not have_train:
        if os.environ.get("RVC_BENCH_SKIP_TRAIN", "") != "1":
            t_budget = max(300.0, min(360.0, left() + 120.0))
            args = ["--b16"] if left() > 60 else []
            trec, terr = _run_section("train", args, t_budget)
            if trec is not None:
                record.update(trec)
            else:
                record["train_error"] = terr
        else:
            record.setdefault("train_skipped", "budget")

    if not have_graph:
        if full is not None and left() > 90:
            grec, gerr = _run_section("graph", [], max(120.0, left()))
            if grec is not None:
                record.update(grec)
            else:
                record["graph_error"] = gerr
        elif full is None:
            # last-chance headline attempt: the sections above just burned
            # minutes — the service may have recovered since
            p3, _err3 = _run_section("pipeline", [], min(hard_cap, 330.0))
            if p3 is not None:
                _absorb_pipeline(p3)

    # headline = sustained throughput of the full conversion path per chip
    # (the serving metric, and stable); single-call latency rides along as
    # latency_xrt — through this tunnel it is dominated by +-30% round-trip
    # jitter (see docs/PERFORMANCE.md)
    xrt = (full.get("stream_xrt") or full["full_xrt"]) if full else 0.0
    final = {
        "metric": "vc_e2e_realtime_factor_48k",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 50.0, 3),
        **record,
    }
    if full is not None:
        try:  # remember the last successful run for stall diagnostics
            os.makedirs(cache_dir, exist_ok=True)
            with open(last_good_path, "w") as f:
                json.dump(final, f)
        except Exception:
            pass
    print(json.dumps(final))


if __name__ == "__main__":
    main()
