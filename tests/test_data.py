"""Tests for the filelist dataset / bucket batcher (parity targets:
rvc/train/data_utils.py, preparing_files.py — cited in rvc_tpu/train/data.py)."""

import numpy as np
import pytest

from rvc_tpu.utils.audio_io import write_wav
from rvc_tpu.train.data import (
    BucketBatcher,
    FileListRow,
    VCDataset,
    pad_batch,
    parse_filelist,
    spectrogram_np,
    train_val_split,
)

SR = 48000
HOP = 480
NFFT = 2048


def _make_example(tmp_path, name, n_frames, sid=0):
    t = n_frames * HOP
    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    wav = (rng.normal(size=t) * 0.1).astype(np.float32)
    wav_path = str(tmp_path / f"{name}.wav")
    write_wav(wav_path, wav, SR, subtype="FLOAT")
    feats = rng.normal(size=(n_frames // 2, 768)).astype(np.float32)
    f0c = rng.integers(1, 255, size=n_frames).astype(np.int64)
    f0f = (rng.random(n_frames) * 400).astype(np.float32)
    fp, cp, vp = (
        str(tmp_path / f"{name}.feats.npy"),
        str(tmp_path / f"{name}.f0c.npy"),
        str(tmp_path / f"{name}.f0f.npy"),
    )
    np.save(fp, feats)
    np.save(cp, f0c)
    np.save(vp, f0f)
    return FileListRow(wav_path, fp, cp, vp, sid)


def _dataset(tmp_path, frame_counts):
    rows = [
        _make_example(tmp_path, f"ex{i}", n) for i, n in enumerate(frame_counts)
    ]
    return VCDataset(rows, SR, NFFT, HOP, NFFT)


def test_spectrogram_np_frame_count():
    wav = np.random.default_rng(0).normal(size=10 * HOP).astype(np.float32)
    spec = spectrogram_np(wav, NFFT, HOP, NFFT)
    assert spec.shape == (10, NFFT // 2 + 1)
    assert np.all(spec > 0)


def test_parse_filelist(tmp_path):
    p = tmp_path / "filelist.txt"
    p.write_text("a.wav|b.npy|c.npy|d.npy|3\n\ne.wav|f.npy|g.npy|h.npy|bad\n")
    rows = parse_filelist(str(p))
    assert len(rows) == 2
    assert rows[0].sid == 3
    assert rows[1].sid == 0  # malformed sid tolerated like the reference


def test_dataset_example_alignment(tmp_path):
    ds = _dataset(tmp_path, [40])
    e = ds[0]
    n = int(e["length"])
    assert e["phone"].shape == (n, 768)
    assert e["pitch"].shape == (n,)
    assert e["spec"].shape[0] == n
    assert len(e["wave"]) == n * HOP


def test_pad_batch_static_shape(tmp_path):
    ds = _dataset(tmp_path, [30, 40])
    batch = pad_batch([ds[0], ds[1]], target_frames=50, hop_length=HOP)
    assert batch["phone"].shape == (2, 50, 768)
    assert batch["spec"].shape == (2, 50, NFFT // 2 + 1)
    assert batch["wave"].shape == (2, 50 * HOP, 1)
    # sorted by descending length like the reference collate
    assert batch["spec_lengths"][0] >= batch["spec_lengths"][1]
    # padding region is zero
    n0 = int(batch["spec_lengths"][0])
    assert np.all(batch["phone"][0, n0:] == 0)


def test_bucket_batcher_static_shapes(tmp_path):
    ds = _dataset(tmp_path, [30, 40, 60, 80, 110, 120])
    bb = BucketBatcher(ds, batch_size=2, boundaries=(0, 50, 100, 150), shuffle=True)
    shapes = set()
    n_batches = 0
    for batch in bb(epoch=0):
        shapes.add(batch["phone"].shape[1])
        assert batch["phone"].shape[0] == 2
        n_batches += 1
    assert n_batches == bb.steps_per_epoch()
    assert shapes <= {50, 100, 150}  # only bucket-boundary shapes


def test_bucket_batcher_sharding_disjoint(tmp_path):
    ds = _dataset(tmp_path, [30, 35, 40, 45])
    ids0 = [i for _, ids in BucketBatcher(
        ds, 1, (0, 50), shard_index=0, num_shards=2, shuffle=False
    ).epoch_batches(0) for i in ids]
    ids1 = [i for _, ids in BucketBatcher(
        ds, 1, (0, 50), shard_index=1, num_shards=2, shuffle=False
    ).epoch_batches(0) for i in ids]
    assert len(ids0) == len(ids1) == 2
    assert not (set(ids0) & set(ids1))


def test_bucket_batcher_epoch_shuffle_differs(tmp_path):
    ds = _dataset(tmp_path, [30, 35, 40, 45, 50, 55, 60, 65])
    bb = BucketBatcher(ds, 2, (0, 100), shuffle=True)
    order0 = [ids for _, ids in bb.epoch_batches(0)]
    order1 = [ids for _, ids in bb.epoch_batches(1)]
    assert order0 != order1


def test_train_val_split_seeded():
    rows = [FileListRow(f"{i}.wav", "", "", "", 0) for i in range(20)]
    t1, v1 = train_val_split(rows, 0.1, seed=7)
    t2, v2 = train_val_split(rows, 0.1, seed=7)
    assert [r.wav_path for r in v1] == [r.wav_path for r in v2]
    assert len(v1) == 2 and len(t1) == 18


def test_device_data_cache_matches_streamed_batches(tmp_path):
    """DeviceDataCache.batch must equal pad_batch for the same plan
    (distinct lengths -> deterministic collate order)."""
    import jax

    from rvc_tpu.train.data import (BucketBatcher, DeviceDataCache,
                                    FileListRow, VCDataset, pad_batch)
    from rvc_tpu.utils.audio_io import write_wav

    sr, hop = 48000, 480
    rows = []
    rng = np.random.default_rng(0)
    for i, frames in enumerate((60, 80, 120, 150)):
        wav = (rng.normal(size=frames * hop) * 0.1).astype(np.float32)
        wp = str(tmp_path / f"{i}.wav")
        write_wav(wp, wav, sr, subtype="FLOAT")
        fp = str(tmp_path / f"f{i}.npy")
        cp = str(tmp_path / f"c{i}.npy")
        vp = str(tmp_path / f"v{i}.npy")
        np.save(fp, rng.normal(size=(frames // 2, 768)).astype(np.float32))
        np.save(cp, rng.integers(1, 255, size=frames).astype(np.int64))
        np.save(vp, (rng.random(frames) * 300).astype(np.float32))
        rows.append(FileListRow(wp, fp, cp, vp, 0))

    ds = VCDataset(rows, sr, 2048, hop, 2048)
    batcher = BucketBatcher(ds, batch_size=2, shuffle=False)
    cache = DeviceDataCache(ds, batcher)
    assert DeviceDataCache.estimate_bytes(ds, batcher) > 0

    for frames, ids in batcher.epoch_batches(epoch=0):
        got = jax.device_get(cache.batch(frames, ids))
        want = pad_batch([ds[i] for i in ids], min(frames, 900), hop)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)
