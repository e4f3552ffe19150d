"""Measured primed cold start: prime the cache, then time a FRESH
`cli infer` process to first audio (round-5 VERDICT #7).

The round-3 number (240 s cold compile -> 54 s against a primed cache) was
measured at the library layer; this script measures the actual product
path end to end, in subprocesses, the way a user hits it:

  1. stage a flagship-architecture 48k checkpoint (host-materialized
     random weights — XLA cache keys cover program structure, not values)
     and a 10 s wav;
  2. `python -m rvc_tpu.cli prerequisites --prime_cache 10` against
     RVC_TPU_COMPILE_CACHE (install-time step, timed);
  3. fresh process: `python -m rvc_tpu.cli infer ...` (timed = the primed
     cold start to first converted audio).

Prints one JSON line; also appended to docs/artifacts/cold_start_r5.json.
Usage: python scripts/measure_cold_start.py [--fresh-cache]
"""

import dataclasses
import json
import os
import subprocess
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "docs", "artifacts", "cold_start_r5.json")


def stage():
    import jax

    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.utils.checkpoints import save_checkpoint

    mpath = os.path.join(ROOT, "logs", "cold_start", "flagship48k.npz")
    wpath = os.path.join(ROOT, "logs", "cold_start", "input10s.wav")
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    if not os.path.isfile(wpath):
        sr = 16000
        tt = np.arange(10 * sr) / sr
        sig = (0.3 * np.sin(2 * np.pi * 210 * tt)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * tt))).astype(np.float32)
        with wave.open(wpath, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((sig * 32767).astype(np.int16).tobytes())
    if not os.path.isfile(mpath):
        cfg = get_config(48000)
        model = Synthesizer.from_config(cfg)
        t = 64
        shapes = jax.eval_shape(
            lambda r: model.init(
                r, jnp.zeros((1, t, 768)), jnp.asarray([t], jnp.int32),
                jnp.full((1, t), 100, jnp.int32), jnp.full((1, t), 220.0),
                jnp.zeros((1, t, cfg.data.spec_channels)),
                jnp.asarray([t], jnp.int32), jnp.zeros((1,), jnp.int32)),
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)})
        host = np.random.default_rng(0)
        params = jax.tree.map(
            lambda s: host.normal(size=s.shape, scale=0.02).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else np.zeros(s.shape, s.dtype),
            shapes)["params"]
        save_checkpoint(mpath, params, {
            "sample_rate": 48000, "f0": 1, "version": "v2", "epoch": 0,
            "step": 0, "vocoder": "HiFi-GAN"})
    return mpath, wpath


def run(cmd, env, timeout):
    t0 = time.perf_counter()
    p = subprocess.run(cmd, env=env, cwd=ROOT, timeout=timeout,
                       capture_output=True, text=True)
    dt = time.perf_counter() - t0
    return dt, p


def main():
    cache = os.path.join(ROOT, ".cold_start_cache")
    if "--fresh-cache" in sys.argv and os.path.isdir(cache):
        import shutil

        shutil.rmtree(cache)
    mpath, wpath = stage()
    env = dict(os.environ, RVC_TPU_COMPILE_CACHE=cache)
    out = os.path.join(ROOT, "logs", "cold_start", "out.wav")

    t_prime, p1 = run(
        [sys.executable, "-m", "rvc_tpu.cli", "prerequisites",
         "--prime_cache", "10"], env, 3600)
    print(f"prime_cache: {t_prime:.1f}s rc={p1.returncode}", flush=True)
    if p1.returncode != 0:
        print(p1.stderr[-800:])

    t_infer, p2 = run(
        [sys.executable, "-m", "rvc_tpu.cli", "infer",
         "--input_path", wpath, "--output_path", out,
         "--pth_path", mpath, "--index_path", "",
         "--f0_method", "rmvpe", "--precision", "bf16"], env, 3600)
    ok = p2.returncode == 0 and os.path.isfile(out)
    print(f"primed cold infer: {t_infer:.1f}s rc={p2.returncode} "
          f"output={'ok' if ok else 'MISSING'}", flush=True)
    if not ok:
        print(p2.stdout[-400:])
        print(p2.stderr[-1200:])

    rec = {"prime_cache_s": round(t_prime, 1),
           "primed_cold_infer_s": round(t_infer, 1),
           "ok": ok, "cache": cache}
    print(json.dumps(rec))
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    hist = []
    if os.path.isfile(ART):
        hist = json.load(open(ART))
    hist.append(rec)
    json.dump(hist, open(ART, "w"), indent=1)


if __name__ == "__main__":
    main()
