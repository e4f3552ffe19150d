"""Regression tests for the round-2f training-subsystem review findings:
short-clip bucket drop, spectrogram_np window padding, balancer AdamW state
(+ persistence fields), per-update GP rng, pretrained-tree validation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.train.data import BucketBatcher, spectrogram_np
from rvc_tpu.train.step import (
    BALANCER_INIT,
    init_balancer,
    make_balancer_optimizer,
)


class _FakeDS:
    def __init__(self, lengths):
        self.lengths = list(lengths)


def test_bucket_batcher_drops_sub_boundary_clips():
    # lengths <= boundaries[0] (50) are dropped when real-length clips exist
    # (reference DistributedBucketSampler._bisect -> -1, data_utils.py:355)
    ds = _FakeDS([10, 40, 120, 300])
    b = BucketBatcher(ds, batch_size=1, shuffle=False)
    kept = sorted(i for bucket in b.buckets for i in bucket)
    assert kept == [2, 3]


def test_bucket_batcher_keeps_all_short_toy_dataset():
    ds = _FakeDS([10, 20, 30])
    b = BucketBatcher(ds, batch_size=1, shuffle=False)
    kept = sorted(i for bucket in b.buckets for i in bucket)
    assert kept == [0, 1, 2]  # fallback: no empty epochs on smoke datasets


def test_spectrogram_np_short_window():
    # win_length < n_fft must zero-pad the window (ops.stft convention),
    # not crash on a shape mismatch
    from rvc_tpu.ops.stft import spectrogram

    wav = np.random.default_rng(0).normal(size=4000).astype(np.float32) * 0.3
    host = spectrogram_np(wav, n_fft=512, hop=128, win=256)
    dev = np.asarray(spectrogram(jnp.asarray(wav)[None], 512, 128, 256))[0]
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, rtol=2e-3, atol=2e-3)


def test_balancer_optimizer_is_adam_with_schedule():
    bal = init_balancer()
    grads = {k: jnp.asarray(1.0) for k in bal}
    lr = 1e-2
    tx = make_balancer_optimizer(None, lr)
    st = tx.init(bal)
    import optax

    up1, st = tx.update(grads, st, bal)
    bal1 = optax.apply_updates(bal, up1)
    # Adam's first step moves by ~lr regardless of raw grad magnitude
    # (moment normalization) — raw SGD would move by lr*g exactly.
    big = {k: jnp.asarray(1000.0) for k in bal}
    tx2 = make_balancer_optimizer(None, lr)
    st2 = tx2.init(bal)
    up2, _ = tx2.update(big, st2, bal)
    bal2 = optax.apply_updates(bal, up2)
    d1 = abs(float(bal1["mel"]) - BALANCER_INIT["mel"])
    d2 = abs(float(bal2["mel"]) - BALANCER_INIT["mel"])
    assert d1 == pytest.approx(lr, rel=0.05)
    assert d2 == pytest.approx(lr, rel=0.05)  # normalized, not 1000x larger

    # state pytree shape is identical with/without an explicit schedule
    # (checkpoint compatibility for _restore_opt_state)
    tx3 = make_balancer_optimizer(lambda s: 1e-3)
    assert jax.tree.structure(tx3.init(bal)) == jax.tree.structure(st)


def test_gradient_penalty_half_batch_matches_doubled():
    """The even-batch split path must equal the naive disc_apply(x, x)
    critic (identical scores, half the compute)."""
    from rvc_tpu.train import losses as L

    class _Disc:
        def apply(self, params, y, y_hat):
            # mimic run_discriminators: one doubled batch, split outputs
            xy = jnp.concatenate([y, y_hat], axis=0)
            b = y.shape[0]
            out = (xy**2).sum(axis=(1, 2), keepdims=False)[:, None] * params["w"]
            return [out[:b]], [out[b:]], [[out[:b]]], [[out[b:]]]

    disc = _Disc()
    params = {"w": jnp.asarray(1.5)}
    rng = jax.random.PRNGKey(0)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 1))
    fake = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 1))
    gp_even = L.gradient_penalty(rng, disc.apply, params, real, fake)
    # odd batch exercises the fallback path
    gp_odd = L.gradient_penalty(rng, disc.apply, params, real[:3], fake[:3])
    assert np.isfinite(float(gp_even)) and np.isfinite(float(gp_odd))
    # different rng -> different interpolates -> different penalty
    gp_b = L.gradient_penalty(jax.random.PRNGKey(9), disc.apply, params, real, fake)
    assert float(gp_even) != pytest.approx(float(gp_b))


def test_tree_signature_guard():
    from rvc_tpu.train.trainer import _tree_signature

    a = {"x": np.zeros((2, 3)), "sub": {"y": np.ones(4)}}
    b = {"x": np.zeros((2, 3)), "sub": {"y": np.ones(4)}}
    c = {"x": np.zeros((2, 4)), "sub": {"y": np.ones(4)}}  # shape mismatch
    d = {"x": np.zeros((2, 3))}  # missing key
    assert _tree_signature(a) == _tree_signature(b)
    assert _tree_signature(a) != _tree_signature(c)
    assert _tree_signature(a) != _tree_signature(d)
