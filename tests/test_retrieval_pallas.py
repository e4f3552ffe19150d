"""Pallas streaming k-NN kernel vs the dense XLA reference (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.ops.retrieval import knn_search
from rvc_tpu.ops.retrieval_pallas import knn_search_pallas

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def test_pallas_knn_matches_dense():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 32)).astype(np.float32)
    v = rng.normal(size=(1000, 32)).astype(np.float32)
    d_ref, i_ref = knn_search(jnp.asarray(q), jnp.asarray(v), 8)
    d, i = knn_search_pallas(jnp.asarray(q), jnp.asarray(v), 8, tile=256,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-4)


def test_pallas_knn_padded_tail():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    v = rng.normal(size=(300, 16)).astype(np.float32)  # not a tile multiple
    d_ref, i_ref = knn_search(jnp.asarray(q), jnp.asarray(v), 4)
    d, i = knn_search_pallas(jnp.asarray(q), jnp.asarray(v), 4, tile=128,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
