from .mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicated_sharding,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_mesh_for_batch",
    "replicated_sharding",
    "shard_batch",
    "shard_train_step",
]
