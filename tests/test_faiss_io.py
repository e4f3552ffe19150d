"""faiss index-file interop (utils/faiss_io.py).

The reference stores retrieval indexes as faiss binaries
(extract_index.py:62-71) and consumes them via read_index +
reconstruct_n(0, ntotal) (pipeline.py:553-561). These tests pin our
pure-Python implementation of that serialization:

  - a hand-packed IndexFlatL2 / IndexIVFFlat byte stream (built here with
    struct, independent of the writer) parses to the expected matrix — the
    format itself is asserted, not just writer/reader self-consistency;
  - writer -> reader round trips (full and sparse inverted-list encodings,
    non-trivial id scatter);
  - FeatureIndex.load and the index builder's --export_faiss wiring.
"""

import os
import struct

import numpy as np
import pytest

from rvc_tpu.utils import faiss_io


def _pack_header(d, ntotal, metric=1):
    return (struct.pack("<i", d) + struct.pack("<q", ntotal)
            + struct.pack("<q", 1 << 20) + struct.pack("<q", 1 << 20)
            + b"\x01" + struct.pack("<i", metric))


def _pack_flat(vectors, fourcc=b"IxF2", metric=1):
    n, d = vectors.shape
    return (fourcc + _pack_header(d, n, metric)
            + struct.pack("<Q", n * d)
            + np.ascontiguousarray(vectors, "<f4").tobytes())


def test_read_hand_packed_flat(tmp_path):
    vecs = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = tmp_path / "flat.index"
    path.write_bytes(_pack_flat(vecs))
    out = faiss_io.read_index_vectors(str(path))
    np.testing.assert_array_equal(out, vecs)


def test_read_hand_packed_ivf_flat_scatters_by_id(tmp_path):
    # 4 vectors, d=2, nlist=2; list 0 holds ids [2, 0], list 1 holds [1, 3]
    # -> reconstruct order must be id order, not list order.
    vecs = np.array([[0., 1.], [2., 3.], [4., 5.], [6., 7.]], np.float32)
    cents = np.array([[0., 0.], [5., 5.]], np.float32)
    lists = [(np.array([2, 0]),), (np.array([1, 3]),)]
    buf = b"IwFl" + _pack_header(2, 4)
    buf += struct.pack("<Q", 2) + struct.pack("<Q", 1)   # nlist, nprobe
    buf += _pack_flat(cents)                             # coarse quantizer
    buf += b"\x00" + struct.pack("<Q", 0)                # DirectMap NoMap
    buf += b"ilar" + struct.pack("<Q", 2) + struct.pack("<Q", 8)
    buf += b"full" + struct.pack("<Q", 2)
    buf += np.array([2, 2], "<u8").tobytes()
    for (ids,) in lists:
        buf += np.ascontiguousarray(vecs[ids], "<f4").tobytes()
        buf += ids.astype("<i8").tobytes()
    path = tmp_path / "ivf.index"
    path.write_bytes(buf)
    out = faiss_io.read_index_vectors(str(path))
    np.testing.assert_array_equal(out, vecs)


def test_flat_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((17, 24)).astype(np.float32)
    p = str(tmp_path / "f.index")
    faiss_io.write_index_flat(p, vecs)
    np.testing.assert_array_equal(faiss_io.read_index_vectors(p), vecs)
    assert faiss_io.is_faiss_file(p)


@pytest.mark.parametrize("n,nlist", [(64, 4), (40, 37)])
def test_ivf_roundtrip_full_and_sparse(tmp_path, n, nlist):
    # nlist=4 with 64 vecs -> every list non-empty -> "full" encoding;
    # nlist=37 with 40 vecs -> most lists empty -> "sprs" encoding.
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    p = str(tmp_path / "i.index")
    used = faiss_io.write_index_ivf_flat(p, vecs, nlist=nlist, seed=3)
    assert used == nlist
    np.testing.assert_array_equal(faiss_io.read_index_vectors(p), vecs)


def test_default_nlist_matches_reference_rule():
    # extract_index.py:59: n_ivf = min(16 * sqrt(N), N // 39)
    for n in (39, 1000, 10_000, 200_000):
        assert faiss_io.default_nlist(n) == max(
            1, min(int(16 * np.sqrt(n)), n // 39))


def test_feature_index_loads_faiss_and_npz(tmp_path):
    from rvc_tpu.ops.retrieval import FeatureIndex

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    fp = str(tmp_path / "a.index")
    faiss_io.write_index_ivf_flat(fp, vecs, nlist=5)
    npz = str(tmp_path / "a.index.npz")
    FeatureIndex(vecs).save(npz)
    np.testing.assert_array_equal(
        np.asarray(FeatureIndex.load(fp).vectors),
        np.asarray(FeatureIndex.load(npz).vectors))


def test_build_index_export_faiss(tmp_path):
    from rvc_tpu.train.index_builder import build_index

    exp = tmp_path / "mymodel"
    (exp / "extracted").mkdir(parents=True)
    rng = np.random.default_rng(4)
    np.save(exp / "extracted" / "x.npy",
            rng.standard_normal((80, 12)).astype(np.float32))
    out = build_index(str(exp), export_faiss=True)
    assert out.endswith("mymodel.index.npz")
    faiss = [f for f in os.listdir(exp)
             if f.startswith("added_IVF") and f.endswith("_mymodel_v2.index")]
    assert len(faiss) == 1
    got = faiss_io.read_index_vectors(str(exp / faiss[0]))
    want = np.load(out)["vectors"]
    np.testing.assert_array_equal(got, want)


def test_reader_rejects_unknown_fourcc(tmp_path):
    p = tmp_path / "x.index"
    p.write_bytes(b"IwPQ" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported faiss index type"):
        faiss_io.read_index_vectors(str(p))


def test_reader_rejects_truncated_file(tmp_path):
    vecs = np.ones((4, 4), np.float32)
    p = tmp_path / "t.index"
    p.write_bytes(_pack_flat(vecs)[:-7])
    with pytest.raises(ValueError, match="truncated"):
        faiss_io.read_index_vectors(str(p))
