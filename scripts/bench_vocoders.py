"""Vocoder-variant serving bench: BASELINE.json configs 3 and 4.

Measures end-to-end conversion xRT for the MRF-HiFi-GAN and RefineGAN
decoders (the headline bench.py path uses the default NSF-HiFi-GAN), the
formant-shift host-path overhead (config 3: "MRF + formant shift, batched
folder inference"), and a TTS-to-VC chain (config 4: the tabs/tts path,
offline fallback synth in zero-egress environments).

Like bench.py, weights are random — structurally identical compute — and
timing forces device->host fetches (block_until_ready returns early on the
remote-attached backend). Prints one JSON line with all sections.

Run: python scripts/bench_vocoders.py   (~10-20 min cold, ~4 min warm)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _abstract_init, _log  # noqa: E402


def _build_pipeline(vocoder: str):
    import jax
    import jax.numpy as jnp

    from rvc_tpu.configs import get_config
    from rvc_tpu.embedders import FlaxHubert, HubertConfig
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig
    from rvc_tpu.models.synthesizer import Synthesizer

    cfg = get_config(48000, vocoder=vocoder)
    model = Synthesizer.from_config(cfg)
    hubert = FlaxHubert(HubertConfig())
    key = jax.random.PRNGKey(0)
    t_frames = 64
    hub_params = _abstract_init(
        lambda k, a: hubert.init(k, a), key, jnp.zeros((1, 3200), jnp.float32)
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
    return Pipeline(
        48000, model, synth_vars["params"], hubert, hub_params,
        PipelineConfig(), upsample_factor=cfg.upsample_factor,
        precision="bf16",
    )


def bench_vocoder(vocoder: str, formant: bool = False,
                  seconds: float = 10.0, n_runs: int = 5) -> dict:
    """Median conversion xRT through the full Pipeline for one decoder."""
    from rvc_tpu.infer.formant import formant_shift

    pipe = _build_pipeline(vocoder)
    t16 = int(seconds * 16000)
    rng = np.random.default_rng(0)
    tt = np.arange(t16) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * tt)
             + 0.05 * rng.normal(size=t16)).astype(np.float32)
    kwargs = dict(sid=0, pitch_shift=2, f0_method="yin", index_rate=0.0,
                  protect=0.5)

    host_dsp = 0.0
    if formant:
        t0 = time.perf_counter()
        audio = formant_shift(audio, 16000, quefrency_ms=1.0, timbre=1.2)
        host_dsp = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = pipe.pipeline(audio, **kwargs)  # warmup
    warm = time.perf_counter() - t0
    assert np.isfinite(out).all()
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        pipe.pipeline(audio, **kwargs)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    rec = {"xrt": round(seconds / med, 1), "warmup_s": round(warm, 1),
           "spread_s": [round(min(times), 3), round(max(times), 3)]}
    if formant:
        rec["formant_host_dsp_s"] = round(host_dsp, 3)
    return rec


def bench_tts_chain(seconds_text: str = "benchmarking the text to speech "
                    "to voice conversion chain on one chip") -> dict:
    """Config 4: TTS synth (offline fallback when edge-tts/network absent)
    followed by RefineGAN conversion — wall-clock of the full chain."""
    import tempfile

    from rvc_tpu.utils.tts import run_tts

    pipe = _build_pipeline("RefineGAN")
    with tempfile.TemporaryDirectory() as td:
        wav = os.path.join(td, "tts.wav")
        t0 = time.perf_counter()
        run_tts(seconds_text, "en-US-AriaNeural", 0, wav)
        tts_s = time.perf_counter() - t0
        from rvc_tpu.utils.audio_io import load_audio

        audio = load_audio(wav, 16000)
        kwargs = dict(sid=0, pitch_shift=0, f0_method="yin", index_rate=0.0)
        pipe.pipeline(audio, **kwargs)  # warmup
        t0 = time.perf_counter()
        out = pipe.pipeline(audio, **kwargs)
        vc_s = time.perf_counter() - t0
    dur = len(audio) / 16000.0
    return {"tts_s": round(tts_s, 2), "vc_s": round(vc_s, 2),
            "audio_s": round(dur, 2),
            "chain_xrt": round(dur / max(tts_s + vc_s, 1e-9), 1)}


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    record = {}
    for vocoder, formant in (("MRF HiFi-GAN", True), ("RefineGAN", False)):
        tag = vocoder.split()[0].lower()
        t0 = time.perf_counter()
        try:
            record[tag] = bench_vocoder(vocoder, formant=formant)
            _log(f"{vocoder} done {time.perf_counter()-t0:.0f}s: {record[tag]}")
        except Exception as e:
            record[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        record["tts_chain"] = bench_tts_chain()
    except Exception as e:
        record["tts_chain_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
