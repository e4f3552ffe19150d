"""On-chip probe: does batching whole files into one fused conversion
program raise aggregate serving throughput past the single-file stream?

The single-file sustained stream sits within ~8 ms of its 44 ms device
bound (docs/PERFORMANCE.md), so the only remaining serving lever is
per-file device time. The fused graph is batch-first end to end
(infer/pipeline.py voice_conversion_fused_many); B files in one program
give the MXU B-fold larger matmuls in the small-channel slices (HuBERT,
TextEncoder, RMVPE) at the cost of one more compiled shape.

Prints per-B wall time per file (honest fetch sync) and aggregate xRT.
Usage: python scripts/probe_batch_serving.py [B ...]   (default 1 2 4)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (reuses the bench's cache config + model setup)

bench._configure_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rvc_tpu.configs import get_config  # noqa: E402
from rvc_tpu.embedders import FlaxHubert, HubertConfig  # noqa: E402
from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig  # noqa: E402
from rvc_tpu.models.synthesizer import Synthesizer  # noqa: E402
from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel  # noqa: E402


def main() -> None:
    bs = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    cfg = get_config(48000)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())
    seconds = 10.0
    t16 = int(seconds * 16000)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    hub_params = bench._abstract_init(
        lambda k, a: hubert.init(k, a), key, jnp.zeros((1, 3200), jnp.float32)
    )["params"]
    t_frames = 64
    synth_vars = bench._abstract_init(
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
    pipe.set_rmvpe(rmvpe)
    index_vectors = jax.block_until_ready(jnp.asarray(
        rng.normal(size=(65536, 768)).astype(np.float32)))
    tt = np.arange(t16) / 16000

    def mk(i):
        seg = (0.4 * np.sin(2 * np.pi * (180 + 10 * i) * tt)
               + 0.05 * rng.normal(size=t16)).astype(np.float32)
        return np.pad(pipe._highpass(seg), (pipe.t_pad, pipe.t_pad),
                      mode="reflect")

    for B in bs:
        segs = [mk(i) for i in range(B)]
        kw = dict(sid=0, index_vectors=index_vectors, index_rate=0.75,
                  protect=0.33, pitch_shift=2, filter_radius=3)
        t0 = time.perf_counter()
        outs = pipe.voice_conversion_fused_many(
            segs, rng=jax.random.PRNGKey(3), **kw)
        warm = time.perf_counter() - t0
        assert all(np.isfinite(o).all() for o in outs), B
        print(f"B={B} warmup {warm:.1f}s", flush=True)
        dts = []
        for r in range(5):
            t0 = time.perf_counter()
            outs = pipe.voice_conversion_fused_many(
                segs, rng=jax.random.PRNGKey(4 + r), **kw)
            dts.append(time.perf_counter() - t0)
        med = sorted(dts)[len(dts) // 2]
        print(f"B={B}: {med*1000:.0f} ms/call = {med*1000/B:.1f} ms/file, "
              f"aggregate {seconds*B/med:.0f} xRT "
              f"(spread {min(dts):.3f}-{max(dts):.3f})", flush=True)


if __name__ == "__main__":
    main()
