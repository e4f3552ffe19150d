"""Orbax-backed sharded checkpointing for multi-host training.

The native .npz format (utils/checkpoints.py) writes a full replica from
host 0 — right for single-host runs and for interop, but on a pod every
host would either duplicate work or funnel through one process. This module
wraps orbax.checkpoint.StandardCheckpointer: each host writes its own shard
of the (possibly sharded) train state, and restore rebuilds arrays with the
target mesh's shardings. The trainer keeps .npz as the default and uses
orbax when TrainerArgs.use_orbax is set (multi-host jobs).

The reference has no equivalent — its DDP checkpoints are single-process
torch.save files (rvc/train/utils.py:85-118).
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(path: str, state: Any) -> str:
    """Write a sharded checkpoint of an arbitrary pytree (TrainState)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(path: str, template: Any) -> Any:
    """Restore into the template's structure/shardings (pass the freshly
    initialized TrainState so arrays land on the current mesh)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    target = jax.tree.map(
        lambda a: ocp.utils.to_shape_dtype_struct(a)
        if hasattr(a, "shape") else a,
        template,
    )
    return ckptr.restore(path, target)


def latest_step_dir(base: str, prefix: str = "orbax_") -> Optional[str]:
    """Newest orbax checkpoint directory under base (numeric suffix)."""
    if not os.path.isdir(base):
        return None
    cands = []
    for name in os.listdir(base):
        if name.startswith(prefix):
            try:
                cands.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if not cands:
        return None
    return os.path.join(base, max(cands)[1])
