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


def test_pallas_query_chunking_matches_dense():
    """T > Q_BLOCK splits into independent query chunks; results must equal
    the dense kernel row-for-row (the production fused path can batch
    thousands of frames into one retrieval call)."""
    import rvc_tpu.ops.retrieval_pallas as rp
    from rvc_tpu.ops.retrieval import knn_search

    rng = np.random.default_rng(3)
    t = rp.Q_BLOCK + 200
    q = jnp.asarray(rng.normal(size=(t, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(500, 64)), jnp.float32)
    d_ref, i_ref = knn_search(q, v, 4)
    d_p, i_p = rp.knn_search_pallas(q, v, 4, tile=256, interpret=True)
    assert d_p.shape == (t, 4) and i_p.shape == (t, 4)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
