"""AOT memory analysis of the flagship train step on a v5e-8 topology.

Answers the multichip-fit question without 8 physical chips: JAX AOT
compilation (jax.experimental.topologies) compiles the FULL-SIZE 48 kHz
fused GAN train step — real parameter shapes, per-chip batch, dp shardings —
against an 8-device v5e topology description and reports the compiler's
per-device HBM numbers (argument/output/temp/generated-code sizes). The
same numbers for the attached single chip are printed for comparison.

Everything is abstract (jax.eval_shape): no parameters are materialized, so
this runs in seconds of host work plus one XLA compile.

Run: python scripts/aot_memory_analysis.py [--devices 8] [--batch-per-chip 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _abstract_state_and_batch(cfg, model_g, model_d, tx_g, tx_d,
                              batch_size: int):
    """ShapeDtypeStructs for (TrainState, batch, rng) — no allocation."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.train.step import create_train_state

    d = cfg.data
    frames = 400
    seg_frames = cfg.train.segment_size // d.hop_length
    # ShapeDtypeStructs, NOT real jnp.zeros: eval_shape only needs shapes,
    # and materializing ~230 MB of device arrays through the remote tunnel
    # would contradict this script's whole point
    batch = {
        "phone": jax.ShapeDtypeStruct((batch_size, frames, 768), jnp.float32),
        "phone_lengths": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        "pitch": jax.ShapeDtypeStruct((batch_size, frames), jnp.int32),
        "pitchf": jax.ShapeDtypeStruct((batch_size, frames), jnp.float32),
        "spec": jax.ShapeDtypeStruct(
            (batch_size, frames, d.spec_channels), jnp.float32),
        "spec_lengths": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        "wave": jax.ShapeDtypeStruct(
            (batch_size, frames * d.hop_length, 1), jnp.float32),
        "sid": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    }
    del seg_frames
    rng = jax.random.PRNGKey(0)
    state_shape = jax.eval_shape(
        lambda r, b: create_train_state(r, cfg, model_g, model_d, tx_g, tx_d, b),
        rng, batch,
    )
    batch_shape = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    rng_shape = jax.ShapeDtypeStruct(rng.shape, rng.dtype)
    return state_shape, batch_shape, rng_shape


def analyze(n_devices: int, batch_per_chip: int) -> dict:
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rvc_tpu.configs import get_config
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.train.optimizers import make_optimizer
    from rvc_tpu.train.step import make_train_step

    cfg = get_config(48000)
    if os.environ.get("RVC_AOT_TINY") == "1":  # structural CI check only
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, inter_channels=8, hidden_channels=8,
                filter_channels=16, n_heads=2, n_layers=1,
                upsample_initial_channel=16, gin_channels=8, spk_embed_dim=4,
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
                upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
            ),
            data=dataclasses.replace(cfg.data, hop_length=64),
            train=dataclasses.replace(cfg.train, segment_size=64 * 8),
        )
        model_g = dataclasses.replace(
            Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1)
        model_d = MultiPeriodDiscriminator(periods=(2, 3))
    else:
        model_g = Synthesizer.from_config(cfg)
        model_d = MultiPeriodDiscriminator()
    tx_g = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate)
    tx_d = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate)
    step = make_train_step(cfg, model_g, model_d, tx_g, tx_d,
                           steps_per_epoch=100)

    global_batch = batch_per_chip * n_devices
    state_s, batch_s, rng_s = _abstract_state_and_batch(
        cfg, model_g, model_d, tx_g, tx_d, global_batch)

    # topology mesh: the attached topology for n=1, a described v5e pod
    # slice otherwise (AOT — no physical devices needed)
    if n_devices == 1:
        mesh = jax.sharding.Mesh(jax.devices()[:1], ("dp",))
    else:
        from jax.experimental import topologies

        # topology-name spelling varies across PJRT plugin versions
        candidates = [
            f"v5e:{n_devices//4}x4" if n_devices % 4 == 0 else f"v5e:1x{n_devices}",
            f"v5e:{n_devices//4}x4x1" if n_devices % 4 == 0 else f"v5e:1x{n_devices}x1",
            f"v5litepod-{n_devices}",
        ]
        topo, errs = None, []
        for name in candidates:
            try:
                topo = topologies.get_topology_desc(name, platform="tpu")
                break
            except Exception as e:
                errs.append(f"{name}: {type(e).__name__}")
        if topo is None:
            raise RuntimeError(f"no topology name accepted: {errs}")
        mesh = topologies.make_mesh(topo, (n_devices,), ("dp",))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    shardings_state = jax.tree.map(lambda _: repl, state_s)
    shardings_batch = jax.tree.map(lambda _: data, batch_s)

    jitted = jax.jit(
        step,
        in_shardings=(shardings_state, shardings_batch, repl),
        out_shardings=(shardings_state,
                       jax.tree.map(lambda _: repl,
                                    jax.eval_shape(step, state_s, batch_s,
                                                   rng_s)[1])),
        donate_argnums=(0,),
    )
    lowered = jitted.lower(state_s, batch_s, rng_s)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024.0 ** 3

    def g(name):
        v = getattr(ma, name, None)
        return round(v / gib, 3) if v is not None else None

    return {
        "devices": n_devices,
        "batch_per_chip": batch_per_chip,
        "global_batch": global_batch,
        "argument_gib": g("argument_size_in_bytes"),
        "output_gib": g("output_size_in_bytes"),
        "temp_gib": g("temp_size_in_bytes"),
        "alias_gib": g("alias_size_in_bytes"),
        "generated_code_gib": g("generated_code_size_in_bytes"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--skip-single", action="store_true")
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

    out = {}
    if not args.skip_single:
        try:
            out["single_chip"] = analyze(1, args.batch_per_chip)
        except Exception as e:
            out["single_chip_error"] = f"{type(e).__name__}: {e}"[:300]
    try:
        out[f"v5e_{args.devices}"] = analyze(args.devices, args.batch_per_chip)
    except Exception as e:
        out[f"v5e_{args.devices}_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
