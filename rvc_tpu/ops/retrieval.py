"""Feature-index retrieval: exact k-NN + inverse-square-distance blending.

TPU-native replacement for the reference's faiss round-trip
(rvc/infer/pipeline.py:497-507,553-561: GPU feats -> numpy -> faiss IVF
search k=8 -> weight by 1/dist^2 -> back to GPU). At RVC scale the index is
an HBM-resident [N, 768] matrix, so exact search is one MXU matmul plus a
top-k — the entire CPU round-trip (the reference's worst inference latency
bug) disappears and retrieval fuses into the conversion graph.

Index file format: .npz with key "vectors" [N, 768] float32 (see
rvc_tpu.train.index_builder); reference faiss .index files load directly
through utils.faiss_io. faiss returns squared L2 distances; so does
this kernel, keeping the 1/d^2 weighting numerics identical.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def knn_search(
    queries: jax.Array, vectors: jax.Array, k: int = 8
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2. queries [T, D], vectors [N, D] ->
    (distances [T, k], indices [T, k]), matching faiss IndexIVFFlat output
    semantics (squared L2, sorted ascending)."""
    q2 = jnp.sum(queries**2, axis=1, keepdims=True)          # [T, 1]
    v2 = jnp.sum(vectors**2, axis=1)[None, :]                # [1, N]
    cross = jnp.matmul(
        queries, vectors.T, preferred_element_type=jnp.float32
    )
    d2 = q2 + v2 - 2.0 * cross
    neg_d, idx = jax.lax.top_k(-d2, k)
    return jnp.maximum(-neg_d, 0.0), idx


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_search_tiled(
    queries: jax.Array, vectors: jax.Array, k: int = 8, tile: int = 65536
) -> tuple[jax.Array, jax.Array]:
    """Streaming exact k-NN for HBM-scale indexes.

    Scans the index in `tile`-row blocks with a running top-k merge, so peak
    memory is O(T * tile) instead of O(T * N) — a production-size index
    (millions of rows) streams through the MXU without materializing the
    full distance matrix. Numerically identical to knn_search.
    """
    t, d = queries.shape
    n = vectors.shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        # padded rows get +inf distance via an explicit validity mask
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
    valid = (jnp.arange(n_tiles * tile) < n).reshape(n_tiles, tile)
    vt = vectors.reshape(n_tiles, tile, d)
    q2 = jnp.sum(queries**2, axis=1, keepdims=True)

    def body(carry, inputs):
        best_d, best_i = carry  # [T, k] running (distance, index)
        vtile, vmask, start = inputs
        v2 = jnp.sum(vtile**2, axis=1)[None, :]
        cross = jnp.matmul(
            queries, vtile.T, preferred_element_type=jnp.float32
        )
        d2 = jnp.where(vmask[None, :], q2 + v2 - 2.0 * cross, jnp.inf)
        idx = start + jnp.arange(tile)[None, :].astype(jnp.int32)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=1)
        neg, sel = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (
        jnp.full((t, k), jnp.inf, jnp.float32),
        jnp.zeros((t, k), jnp.int32),
    )
    starts = (jnp.arange(n_tiles) * tile).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (vt, valid, starts))
    return jnp.maximum(best_d, 0.0), best_i


# index row count above which retrieval switches to the streaming kernel
TILED_SEARCH_THRESHOLD = 200_000
# cap on dense [T, N] (or streamed [T, tile]) distance-matrix elements:
# 2^27 f32 = 512 MB of HBM scratch. The dense gate must consider the QUERY
# count too — batched conversion flattens thousands of frames into one call,
# and T * N alone can be multi-GB even under the row threshold.
DENSE_ELEMS_LIMIT = 1 << 27
MIN_TILE = 4096
# pallas streaming-kernel gate (on-device timings, scripts/time_knn.py @
# T=1000/D=768/k=8 on v5e: N=1e4 pallas 6.3 ms vs dense 7.1; N=65536 dense
# 9.6 vs pallas 10.2; N=2e5 pallas 18.4 vs tiled 40.6): the VMEM-resident
# top-k wins for compact kmeans indexes and for everything too big for the
# dense [T, N] product; dense XLA keeps the middle.
PALLAS_SMALL_N = 16_384
PALLAS_TILE = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _search_dispatch(queries: jax.Array, vectors: jax.Array, k: int):
    """Route to the pallas / dense / streaming kernel by device + size."""
    t = int(queries.shape[0])
    n = int(vectors.shape[0])
    dense_fits = n <= TILED_SEARCH_THRESHOLD and t * n <= DENSE_ELEMS_LIMIT
    if _on_tpu() and (n <= PALLAS_SMALL_N or not dense_fits):
        try:
            from .retrieval_pallas import knn_search_pallas

            return knn_search_pallas(queries, vectors, k, tile=PALLAS_TILE)
        except Exception:
            pass  # Mosaic regression on an exotic shape: XLA path below
    if dense_fits:
        return knn_search(queries, vectors, k)
    # bound the streamed block so T * tile also respects the limit
    tile = int(min(65536, max(MIN_TILE, DENSE_ELEMS_LIMIT // max(t, 1))))
    return knn_search_tiled(queries, vectors, k, tile=tile)


@partial(jax.jit, static_argnames=("k",))
def retrieve_blend(
    feats: jax.Array,
    vectors: jax.Array,
    index_rate: jax.Array | float,
    k: int = 8,
) -> jax.Array:
    """Blend each query frame with its k nearest index vectors.

    feats [T, D]; returns [T, D]:
      w_j = (1/d_j^2) normalized; retrieved = sum_j w_j * v_{ix_j};
      out = index_rate * retrieved + (1 - index_rate) * feats
    (reference pipeline.py:497-507 numerics). Large indexes stream through
    the tiled kernel to bound memory.
    """
    d2, idx = _search_dispatch(feats, vectors, k)
    w = 1.0 / jnp.square(jnp.maximum(d2, 1e-12))
    w = w / jnp.sum(w, axis=1, keepdims=True)
    gathered = vectors[idx]                                   # [T, k, D]
    retrieved = jnp.sum(gathered * w[..., None], axis=1)
    return index_rate * retrieved + (1.0 - index_rate) * feats


class FeatureIndex:
    """Host-side handle over an HBM-resident feature index."""

    def __init__(self, vectors: np.ndarray):
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        self.vectors = jnp.asarray(v)
        self.ntotal = v.shape[0]

    @classmethod
    def load(cls, path: str) -> "FeatureIndex":
        """Load a native ``.index.npz`` or a reference faiss ``.index`` file
        (IndexFlat / IndexIVFFlat via utils.faiss_io) — migrating users keep
        their existing retrieval indexes."""
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:2] != b"PK":  # not a zip archive -> try the faiss formats
            from ..utils.faiss_io import read_index_vectors

            return cls(read_index_vectors(path))
        data = np.load(path)
        return cls(data["vectors"])

    def save(self, path: str) -> None:
        np.savez(path, vectors=np.asarray(self.vectors))

    def search(self, queries, k: int = 8):
        # dispatch by peak-memory estimate: a dense [T, N] distance matrix
        # at production index sizes (millions of rows) or batched query
        # counts would not fit in HBM
        return _search_dispatch(jnp.asarray(queries), self.vectors, k)

    def blend(self, feats, index_rate: float, k: int = 8):
        return retrieve_blend(jnp.asarray(feats), self.vectors, index_rate, k)


def kmeans(
    rng: jax.Array,
    data: jax.Array,
    n_clusters: int,
    n_iters: int = 25,
    batch_size: Optional[int] = None,
) -> jax.Array:
    """Lloyd k-means on device (replaces sklearn MiniBatchKMeans compression,
    reference extract_index.py:43-56). data [N, D] -> centroids [K, D].

    The assignment step scans the data in `batch_size`-row chunks,
    accumulating per-centroid sums/counts — a single dense [N, K] distance
    matrix (1M rows x 10k centroids = 40 GB f32) would OOM at exactly the
    dataset sizes the compression exists for. Full-batch Lloyd semantics,
    O(batch_size * K) peak memory.
    """
    n, dim = data.shape
    if batch_size is None:
        batch_size = int(max(1024, min(n, DENSE_ELEMS_LIMIT // max(n_clusters, 1))))
    init_idx = jax.random.choice(rng, n, (n_clusters,), replace=False)
    centroids = data[init_idx]

    n_chunks = -(-n // batch_size)
    pad = n_chunks * batch_size - n
    data_p = jnp.pad(data, ((0, pad), (0, 0))) if pad else data
    chunks = data_p.reshape(n_chunks, batch_size, dim)
    vmask = (jnp.arange(n_chunks * batch_size) < n).astype(
        data.dtype).reshape(n_chunks, batch_size)

    def step(centroids, _):
        c2 = jnp.sum(centroids**2, axis=1)[None, :]  # [1, K]

        def chunk_step(carry, inp):
            sums, counts = carry
            x, m = inp  # [B, D], [B]
            cross = jnp.matmul(
                x, centroids.T, preferred_element_type=jnp.float32)
            idx = jnp.argmin(c2 - 2.0 * cross, axis=1)  # x^2 is constant in k
            oh = jax.nn.one_hot(idx, n_clusters, dtype=jnp.float32)
            oh = oh * m[:, None]  # padded rows contribute nothing
            sums = sums + jnp.matmul(
                oh.T, x, preferred_element_type=jnp.float32)
            counts = counts + oh.sum(axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_step,
            (jnp.zeros((n_clusters, dim), jnp.float32),
             jnp.zeros((n_clusters,), jnp.float32)),
            (chunks, vmask),
        )
        counts = counts[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centroids)
        return new.astype(data.dtype), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    return centroids
