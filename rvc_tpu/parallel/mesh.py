"""Device-mesh parallelism for training and batch inference.

TPU-native replacement for the reference's single-node DDP
(reference rvc/train/train.py:308-309,509-514,733-735: one process per GPU,
NCCL all-reduce, rank-interleaved sampler). Here the whole model (~110M
params) fits per chip, so the faithful and optimal mapping is pure data
parallelism over the ICI mesh: parameters replicated, batch sharded on the
"dp" axis, gradient all-reduce emitted by XLA from the batch-mean losses
under jit. Multi-host extends the same mesh over DCN; per-host data loading
shards files by jax.process_index(), mirroring the reference's bucket-sampler
rank interleave (data_utils.py:332).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DP_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(
    batch_size: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """DP mesh over the largest device count that divides the *global* batch
    size (jit requires the sharded dimension to divide evenly).

    Multi-process: trimming devices would strand other hosts' chips and break
    the per-process shard contract of `shard_batch`, so the global batch must
    divide the full device count exactly.
    """
    if devices is None:
        devices = jax.devices()
    if jax.process_count() > 1:
        if batch_size % len(devices) != 0:
            raise ValueError(
                f"multi-host run: global batch {batch_size} must divide "
                f"evenly over {len(devices)} devices"
            )
        return make_mesh(devices)
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh, axis_name: str = DP_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded along batch dim 0.

    Single-process: a plain sharded device_put. Multi-process: each host's
    batch is its *local shard* of the global batch (BucketBatcher shards by
    process_index), so assemble the global array from per-process local data
    — device_put with a multi-process NamedSharding would instead require the
    identical global value on every host, silently mis-reading shards.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_train_step(train_step, mesh: Mesh):
    """Jit a (state, batch, rng) train step over the mesh.

    Parameters/optimizer state are replicated, the batch is sharded on dim 0.
    XLA turns every batch-mean loss into a psum over the dp axis — the entire
    DDP gradient-sync machinery of the reference collapses into compiler-
    inserted collectives riding ICI.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    # A single sharding per argument broadcasts over every leaf of that
    # argument's pytree (state/rng replicated, all batch arrays dp-sharded).
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
