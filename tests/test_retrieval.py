"""Retrieval kernel tests (parity target: faiss usage in
rvc/infer/pipeline.py:497-507,553-561 and extract_index.py)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from rvc_tpu.ops.retrieval import FeatureIndex, kmeans, knn_search, retrieve_blend

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def _brute_force(queries, vectors, k):
    d2 = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_knn_matches_brute_force():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 16)).astype(np.float32)
    v = rng.normal(size=(50, 16)).astype(np.float32)
    d_ref, i_ref = _brute_force(q, v, 4)
    d, i = knn_search(jnp.asarray(q), jnp.asarray(v), 4)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-4)


def test_retrieve_blend_rate_zero_is_identity():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    v = rng.normal(size=(20, 8)).astype(np.float32)
    out = retrieve_blend(jnp.asarray(q), jnp.asarray(v), 0.0)
    np.testing.assert_allclose(np.asarray(out), q, rtol=1e-5, atol=1e-5)


def test_retrieve_blend_rate_one_snaps_to_index():
    """With queries exactly equal to index rows, rate=1 returns (nearly) the
    row itself: distance ~0 dominates the 1/d^2 weighting."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=(30, 8)).astype(np.float32)
    q = v[:4]
    out = np.asarray(retrieve_blend(jnp.asarray(q), jnp.asarray(v), 1.0))
    np.testing.assert_allclose(out, q, rtol=1e-3, atol=1e-3)


def test_feature_index_save_load(tmp_path):
    v = np.random.default_rng(3).normal(size=(10, 4)).astype(np.float32)
    idx = FeatureIndex(v)
    p = str(tmp_path / "test.index.npz")
    idx.save(p)
    idx2 = FeatureIndex.load(p)
    assert idx2.ntotal == 10
    d, i = idx2.search(v[:2], k=1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], [0, 1])


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(4)
    centers = np.array([[0, 0], [10, 10], [-10, 10]], dtype=np.float32)
    data = np.concatenate(
        [c + rng.normal(scale=0.1, size=(50, 2)).astype(np.float32) for c in centers]
    )
    cent = np.asarray(kmeans(jax.random.PRNGKey(0), jnp.asarray(data), 3, n_iters=10))
    # every true center has a learned centroid within 0.5
    for c in centers:
        assert np.min(np.linalg.norm(cent - c, axis=1)) < 0.5


def test_tiled_search_matches_dense():
    from rvc_tpu.ops.retrieval import knn_search_tiled

    rng = np.random.default_rng(7)
    q = rng.normal(size=(9, 16)).astype(np.float32)
    v = rng.normal(size=(1000, 16)).astype(np.float32)
    d_ref, i_ref = knn_search(jnp.asarray(q), jnp.asarray(v), 8)
    d, i = knn_search_tiled(jnp.asarray(q), jnp.asarray(v), 8, tile=128)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-4,
                               atol=1e-4)


def test_feature_index_search_tiles_large_indexes(monkeypatch):
    """FeatureIndex.search must stream through the tiled scan above the
    threshold (a dense [T, N] matrix OOMs at production index sizes) and
    return results identical to the dense path."""
    import rvc_tpu.ops.retrieval as R

    rng = np.random.default_rng(9)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    v = rng.normal(size=(600, 8)).astype(np.float32)
    idx = FeatureIndex(v)
    d_ref, i_ref = idx.search(q, k=4)
    called = {}
    real_tiled = R.knn_search_tiled

    def spy(*a, **kw):
        called["tiled"] = True
        return real_tiled(*a, **kw)

    monkeypatch.setattr(R, "TILED_SEARCH_THRESHOLD", 500)
    monkeypatch.setattr(R, "knn_search_tiled", spy)
    d, i = idx.search(q, k=4)
    assert called.get("tiled")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)


def test_tiled_search_non_divisible_tile():
    from rvc_tpu.ops.retrieval import knn_search_tiled

    rng = np.random.default_rng(8)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    v = rng.normal(size=(333, 8)).astype(np.float32)
    d_ref, i_ref = knn_search(jnp.asarray(q), jnp.asarray(v), 4)
    d, i = knn_search_tiled(jnp.asarray(q), jnp.asarray(v), 4, tile=100)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
