"""Multi-host train-step worker: one JAX process of an N-process gloo run.

Launched by tests/test_multihost.py (and usable standalone):

    python tests/multihost_worker.py --pid 0 --nproc 2 --port 12345 \
        --outdir /tmp/mh --local-devices 4 --steps 2

Each process owns `local_devices` virtual CPU devices; the global mesh spans
nproc * local_devices. The worker exercises every multi-process branch the
single-process dryrun cannot reach:
  - jax.distributed.initialize + gloo CPU collectives
  - make_mesh_for_batch's process_count>1 path (parallel/mesh.py:46-52)
  - shard_batch's make_array_from_process_local_data branch (mesh.py:78-83)
  - orbax per-host sharded save/restore (utils/orbax_io.py) + resume step
  - trainer._prune_orbax_dirs on the shared exp dir

Matches the semantics of the reference's DDP rank processes
(rvc/train/train.py:509-514, data_utils.py:332): identical replicated model,
rank-sharded data, synchronized gradient reduction.

Writes {outdir}/metrics_{pid}.json with per-step metric dicts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    a = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={a.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # persistent cache: the 1-proc and 2-proc runs share compiles
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_bench_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    if a.nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{a.port}",
            num_processes=a.nproc,
            process_id=a.pid,
        )
    assert jax.process_count() == a.nproc
    n_global = jax.device_count()

    import numpy as np

    from rvc_tpu.parallel import shard_batch, shard_train_step
    from rvc_tpu.parallel.mesh import make_mesh_for_batch
    from rvc_tpu.train.dryrun import build_tiny_train_problem
    from rvc_tpu.train.step import create_train_state, make_train_step
    from rvc_tpu.utils import orbax_io

    if a.nproc > 1:
        # Establish the gloo communicators with a trivial collective FIRST,
        # before any slow per-host compile (model init, train step): gloo
        # context init has a 30 s key-value-exchange deadline, and per-host
        # compile skew on a shared CPU easily exceeds it. Right after
        # distributed init all processes are within ~a second of each other.
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        warm_mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        ones = jax.make_array_from_process_local_data(
            NamedSharding(warm_mesh, P("dp")),
            np.ones((n_global // a.nproc, 1), np.float32),
        )
        warm = jax.jit(
            lambda x: jnp.sum(x), out_shardings=NamedSharding(warm_mesh, P())
        )(ones)
        assert float(warm) == float(n_global)
        # ... and the one-device-per-host group too: multihost device_put
        # runs an internal assert_equal/process_allgather over that group
        # (a separate gloo context with its own 30 s init deadline)
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(np.zeros(1, np.float32))

    cfg, model_g, model_d, tx_g, tx_d, batch = build_tiny_train_problem(
        n_global
    )
    # every host builds the identical global batch deterministically, then
    # keeps only its process-local rows — the contract of
    # make_array_from_process_local_data in shard_batch
    lo = a.pid * (n_global // a.nproc)
    hi = lo + n_global // a.nproc
    local_batch = {k: np.asarray(v)[lo:hi] for k, v in batch.items()}

    state = create_train_state(
        jax.random.PRNGKey(0), cfg, model_g, model_d, tx_g, tx_d, batch
    )
    step = make_train_step(
        cfg, model_g, model_d, tx_g, tx_d, steps_per_epoch=10
    )
    mesh = make_mesh_for_batch(n_global)
    jstep = shard_train_step(step, mesh)
    sbatch = shard_batch(local_batch if a.nproc > 1 else batch, mesh)

    rng_keys = {i: jax.random.PRNGKey(i) for i in (1, 2)}
    if a.nproc > 1:
        # AOT-compile, then hold everyone at a coordination-service barrier
        # so no host enters the first real gloo rendezvous far ahead of the
        # others. Execute through the AOT object (the jit wrapper keeps its
        # own cache and could recompile); AOT inputs must already carry the
        # global shardings, so place the replicated operands explicitly.
        from rvc_tpu.parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))
        rng_keys = {
            i: jax.device_put(k, replicated_sharding(mesh))
            for i, k in rng_keys.items()
        }
        jstep = jstep.lower(state, sbatch, rng_keys[1]).compile()
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "train_step_compiled", timeout_in_ms=1_800_000
        )

    all_metrics = []
    for i in range(a.steps):
        state, metrics = jstep(state, sbatch, rng_keys[1])
        jax.block_until_ready(metrics)
        all_metrics.append({k: float(v) for k, v in metrics.items()})

    # orbax sharded save -> restore into a fresh template -> one more step.
    # Every host participates (per-host shards); path must be shared.
    ckpt_dir = os.path.join(a.outdir, "exp", "orbax_1")
    saved = orbax_io.save_state(ckpt_dir, state)
    from rvc_tpu.parallel.mesh import replicated_sharding

    template = create_train_state(
        jax.random.PRNGKey(0), cfg, model_g, model_d, tx_g, tx_d, batch
    )
    # restore targets must carry the global mesh shardings (a host-local
    # SingleDeviceSharding template is not restorable on a multi-host mesh)
    template = jax.device_put(template, replicated_sharding(mesh))
    restored = orbax_io.restore_state(saved, template)
    state2, metrics2 = jstep(restored, sbatch, rng_keys[2])
    jax.block_until_ready(metrics2)
    all_metrics.append({k: float(v) for k, v in metrics2.items()})

    # second epoch dir + prune (trainer.save_only_latest semantics)
    orbax_io.save_state(os.path.join(a.outdir, "exp", "orbax_2"), state2)
    if a.pid == 0:
        from rvc_tpu.train.trainer import _prune_orbax_dirs

        _prune_orbax_dirs(os.path.join(a.outdir, "exp"), keep_epoch=2)
    latest = orbax_io.latest_step_dir(os.path.join(a.outdir, "exp"))

    # BucketBatcher shard interleave exactly as the trainer wires it
    # (trainer.py:166-170: shard_index=jax.process_index()): each real
    # process derives its own rank plan; the test asserts the two ranks'
    # plans partition the padded global id stream.
    from rvc_tpu.train.data import BucketBatcher

    class _LenOnly:
        lengths = [12, 25, 33, 47, 55, 61, 72, 78, 85, 91, 18, 44]
        hop_length = 160

    bb = BucketBatcher(
        _LenOnly(), batch_size=2, boundaries=(0, 40, 100),
        shard_index=jax.process_index(), num_shards=jax.process_count(),
        shuffle=True,
    )
    plan = [[int(f), [int(i) for i in idxs]]
            for f, idxs in bb.epoch_batches(epoch=3)]

    out = {
        "pid": a.pid,
        "nproc": a.nproc,
        "global_devices": n_global,
        "metrics": all_metrics,
        "latest_ckpt": os.path.basename(latest) if latest else None,
        "batch_plan": plan,
        "steps_per_epoch": bb.steps_per_epoch(),
    }
    with open(os.path.join(a.outdir, f"metrics_{a.pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"[worker {a.pid}] done: {all_metrics[-1]}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
