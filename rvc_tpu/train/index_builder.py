"""Feature-index builder.

Parity target: rvc/train/process/extract_index.py:1-78 — concatenate all
`extracted/*.npy` HuBERT features, shuffle (seed 1234... the reference uses
np.random.shuffle unseeded; we seed for reproducibility), compress to 10k
k-means centroids when the matrix exceeds 2e5 rows, and write the index.

TPU difference: no IVF training/nprobe — search is exact on device
(ops/retrieval.py), so the "index" is just the (optionally compressed)
matrix stored as .npz. n_ivf/nprobe knobs disappear with zero recall loss.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import numpy as np

from ..ops.retrieval import FeatureIndex, kmeans

MAX_ROWS_BEFORE_COMPRESSION = 2 * 10**5
N_CENTROIDS = 10_000


def build_index(
    exp_dir: str,
    output_path: Optional[str] = None,
    seed: int = 1234,
    max_rows: int = MAX_ROWS_BEFORE_COMPRESSION,
    n_centroids: int = N_CENTROIDS,
    algorithm: str = "Auto",
    export_faiss: bool = False,
) -> str:
    """Build `<model>.index.npz` from `<exp_dir>/extracted/*.npy`.

    algorithm (reference extract_index.py / core.py --index_algorithm):
      "Auto"   — k-means-compress only above `max_rows` (default),
      "KMeans" — always compress to `n_centroids`,
      "Faiss"  — never compress (exact flat matrix; the reference's IVF
                 training disappears because device search is exact).

    export_faiss additionally writes a faiss-binary IndexIVFFlat next to the
    npz, named with the reference's ``added_IVF{n}_Flat_..._{model}_v2.index``
    convention — a model trained here drops straight into a reference
    install (utils/faiss_io.py implements the serialization).
    """
    feature_dir = os.path.join(exp_dir, "extracted")
    paths = sorted(glob.glob(os.path.join(feature_dir, "*.npy")))
    if not paths:
        raise FileNotFoundError(f"no extracted features under {feature_dir}")

    feats = np.concatenate([np.load(p) for p in paths], axis=0).astype(np.float32)
    rng = np.random.default_rng(seed)
    rng.shuffle(feats)

    compress = (feats.shape[0] > max_rows if algorithm == "Auto"
                else algorithm.lower() == "kmeans")
    if compress and feats.shape[0] > n_centroids:
        import jax.numpy as jnp

        centroids = kmeans(
            jax.random.PRNGKey(seed), jnp.asarray(feats), n_centroids
        )
        feats = np.asarray(centroids)

    index = FeatureIndex(feats)
    model_name = os.path.basename(os.path.normpath(exp_dir))
    if output_path is None:
        output_path = os.path.join(exp_dir, f"{model_name}.index.npz")
    index.save(output_path)
    if export_faiss:
        from ..utils.faiss_io import default_nlist, write_index_ivf_flat

        nlist = default_nlist(feats.shape[0])
        faiss_path = os.path.join(
            os.path.dirname(output_path),
            f"added_IVF{nlist}_Flat_nprobe_1_{model_name}_v2.index",
        )
        write_index_ivf_flat(faiss_path, feats, nlist=nlist, seed=seed)
    return output_path
