"""Benchmark: end-to-end voice-conversion throughput on one chip.

Measures the jitted conversion graph (HuBERT content encoder -> retrieval-free
feature path -> flagship 48k NSF-HiFi-GAN Synthesizer) converting 10 s of
16 kHz audio, and reports real-time factor (audio seconds per wall second).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-defined north star of 50x
real-time per chip (BASELINE.json; the reference publishes no numbers —
BASELINE.md documents that the baseline had to be driver-defined).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _abstract_init(init_fn, *args) -> dict:
    """Materialize parameters from eval_shape (no init compile): the bench
    measures throughput, not quality, so parameter values are arbitrary."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(0)

    def make(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.asarray(
                rng.normal(size=s.shape, scale=0.02), dtype=s.dtype
            )
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree.map(make, shapes)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.embedders import FlaxHubert, HubertConfig
    from rvc_tpu.models.synthesizer import Synthesizer

    cfg = get_config(48000)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())

    seconds = 10.0
    sr16 = 16000
    t16 = int(seconds * sr16)
    # latent frames at 100 Hz after the x2 feature upsample
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
    out = convert(*args)
    jax.block_until_ready(out)  # compile

    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = convert(*args)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / n_runs

    xrt = seconds / elapsed
    print(json.dumps({
        "metric": "vc_realtime_factor_48k",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
