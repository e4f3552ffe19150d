"""Orbax sharded checkpoint round trip (utils/orbax_io.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.utils.orbax_io import latest_step_dir, restore_state, save_state


def test_orbax_state_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        "step": jnp.asarray(7, jnp.int32),
        "balancer": {"adv": jnp.asarray(-0.3466)},
    }
    p = save_state(str(tmp_path / "orbax_3"), state)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_state(p, template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(12.0).reshape(3, 4)
    )
    assert int(restored["step"]) == 7
    assert float(restored["balancer"]["adv"]) == np.float32(-0.3466)

    save_state(str(tmp_path / "orbax_10"), state)
    assert latest_step_dir(str(tmp_path)).endswith("orbax_10")
    assert latest_step_dir(str(tmp_path / "nope")) is None
