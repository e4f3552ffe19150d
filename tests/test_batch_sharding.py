"""Multi-chip batch serving: enable_batch_sharding splits the batch axis of
the batched conversion paths over a dp mesh (pure data parallelism — every
file independent, weights replicated; the reference's batch mode loops files
serially on one GPU, rvc/infer.py:350-414). Parity: sharded over the 8-device
CPU mesh must equal the unsharded single-device result row for row, including
when the batch pads up to a mesh multiple."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer

SR_MODEL = 32000


def _tiny_cfg():
    cfg = get_config(SR_MODEL)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, filter_length=512, hop_length=320, win_length=512
        ),
        model=dataclasses.replace(
            cfg.model,
            inter_channels=8, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=1, upsample_initial_channel=16, gin_channels=8,
            spk_embed_dim=4, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            upsample_rates=(16, 10, 2), upsample_kernel_sizes=(32, 20, 4),
        ),
        train=dataclasses.replace(cfg.train, segment_size=320 * 4, batch_size=2),
    )


class TinyEmbedder:
    def apply(self, variables, audio):
        b, t = audio.shape
        n = (t - 400) // 320 + 1
        frames = jax.lax.conv_general_dilated_patches(
            audio[:, None, :], filter_shape=(400,), window_strides=(320,),
            padding="VALID",
        )[:, :, :n]
        frames = jnp.transpose(frames, (0, 2, 1))
        proj = variables["params"]["proj"]
        return jnp.matmul(frames, proj, preferred_element_type=jnp.float32)


@pytest.fixture(scope="module")
def tiny_pipe():
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig

    cfg = _tiny_cfg()
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1,
        zero_noise=True,  # determinism: sharded must equal unsharded exactly
    )
    t = 20
    rng = np.random.default_rng(0)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(rng.normal(size=(1, t, 768)), jnp.float32),
        jnp.asarray([t], jnp.int32),
        jnp.full((1, t), 100, jnp.int32),
        jnp.full((1, t), 220.0, jnp.float32),
        jnp.zeros((1, t, cfg.data.spec_channels)),
        jnp.asarray([t], jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    emb = TinyEmbedder()
    emb_params = {"proj": jnp.asarray(
        rng.normal(size=(400, 768)) * 0.01, jnp.float32
    )}
    return Pipeline(
        SR_MODEL, model, vs["params"], emb, emb_params,
        PipelineConfig(x_pad=1, x_query=2, x_center=8, x_max=10),
        upsample_factor=cfg.upsample_factor,
    )


def _segments(rng, n, base=16000):
    tt = np.arange(base) / 16000
    segs = []
    for i in range(n):
        f = 180.0 + 40.0 * i
        ln = base - 2000 * (i % 3)
        segs.append((0.3 * np.sin(2 * np.pi * f * tt[:ln])).astype(np.float32))
    return segs


def test_sharded_segments_batch_matches_unsharded(tiny_pipe):
    """convert_segments_batch over the 8-device dp mesh == unsharded, with
    b=3 padding up to 8 (pad rows replicate row 0 and are sliced away)."""
    rng = np.random.default_rng(3)
    segs = _segments(rng, 3)
    pits, pifs = [], []
    for s in segs:
        n = len(s) // 160
        pits.append(np.full(n, 120, np.int32))
        pifs.append(np.full(n, 220.0, np.float32))
    index_vectors = jnp.asarray(rng.normal(size=(64, 768)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    kw = dict(sids=[0, 0, 0], index_vectors=index_vectors, index_rate=0.7,
              protect=0.3, rng=key)

    plain = tiny_pipe.convert_segments_batch(segs, pits, pifs, **kw)
    assert tiny_pipe._mesh is None
    try:
        tiny_pipe.enable_batch_sharding()
        assert tiny_pipe._mesh is not None and tiny_pipe._mesh.size == 8
        sharded = tiny_pipe.convert_segments_batch(segs, pits, pifs, **kw)
    finally:
        tiny_pipe._mesh = None
        tiny_pipe._repl_cache = {}

    assert [len(x) for x in sharded] == [len(x) for x in plain]
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_fused_many_matches_unsharded(tiny_pipe):
    """voice_conversion_fused_many (rmvpe f0 in-graph) sharded == unsharded."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    tiny_pipe.set_rmvpe(rmvpe)
    rng = np.random.default_rng(4)
    segs = _segments(rng, 3, base=2 * 16000)
    kw = dict(sid=0, index_vectors=None, index_rate=0.0, protect=0.5,
              pitch_shift=2, filter_radius=3, rng=jax.random.PRNGKey(11))
    try:
        plain = tiny_pipe.voice_conversion_fused_many(segs, **kw)
        tiny_pipe.enable_batch_sharding()
        sharded = tiny_pipe.voice_conversion_fused_many(segs, **kw)
    finally:
        tiny_pipe._mesh = None
        tiny_pipe._repl_cache = {}
        tiny_pipe._rmvpe = None

    assert [len(x) for x in sharded] == [len(x) for x in plain]
    # sharded program partitions differently -> different XLA fusion order;
    # tolerance covers float reassociation only (observed max ~7e-6)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_replicated_cache_invalidates_on_swap(tiny_pipe):
    """_replicated re-uploads when the tree's leading leaf changes (model or
    index hot-swap must not serve stale replicated weights)."""
    try:
        tiny_pipe.enable_batch_sharding()
        a = jnp.ones((4, 8))
        r1 = tiny_pipe._replicated("index", a)
        r1_again = tiny_pipe._replicated("index", a)
        assert r1 is r1_again  # cache hit: same upload
        b = jnp.zeros((4, 8))
        r2 = tiny_pipe._replicated("index", b)
        assert r2 is not r1
        np.testing.assert_array_equal(np.asarray(r2), np.zeros((4, 8)))
    finally:
        tiny_pipe._mesh = None
        tiny_pipe._repl_cache = {}


@pytest.mark.slow
def test_fused_batch_stream_matches_fused_many(tiny_pipe):
    """voice_conversion_fused_batch_stream == voice_conversion_fused_many
    applied per group with the documented rng split, including the padded
    last group (5 files, batch=2 -> groups of 2/2/1) and prep overlap."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    tiny_pipe.set_rmvpe(rmvpe)
    rng = np.random.default_rng(9)
    segs = _segments(rng, 5, base=2 * 16000)
    kw = dict(sid=0, index_vectors=None, index_rate=0.0, protect=0.5,
              pitch_shift=1, filter_radius=3)
    key = jax.random.PRNGKey(21)

    def prep(s):
        return s * 0.9

    try:
        streamed = tiny_pipe.voice_conversion_fused_batch_stream(
            segs, batch=2, depth=2, rng=key, prep=prep, **kw)
        expected = []
        subs = list(jax.random.split(key, 3))
        for g in range(3):
            group = [prep(s) for s in segs[2 * g : 2 * g + 2]]
            pad = len(group)  # last group: 1 real file
            if len(group) < 2:  # stream pads to the compiled row count
                group = group + [group[0]]
            outs = tiny_pipe.voice_conversion_fused_many(
                group, rng=subs[g], **kw)
            expected.extend(outs[:pad])
    finally:
        tiny_pipe._rmvpe = None

    assert len(streamed) == len(expected) == 5
    # identical program + identical inputs per group: bit-exact
    for a, b in zip(streamed, expected):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sharded_fused_batch_stream_matches_unsharded(tiny_pipe):
    """The pod-serving mode SCALING.md headlines: the batch stream under
    enable_batch_sharding (rows split over the 8-device dp mesh) must match
    the unsharded stream row for row — 6 files, batch=4 -> two launches,
    the second padded 2->4 (and _batch_rows pads each launch up to the mesh
    multiple of 8)."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    tiny_pipe.set_rmvpe(rmvpe)
    rng = np.random.default_rng(13)
    segs = _segments(rng, 6, base=2 * 16000)
    kw = dict(sid=0, index_vectors=None, index_rate=0.0, protect=0.5,
              pitch_shift=1, filter_radius=3)
    key = jax.random.PRNGKey(29)
    try:
        plain = tiny_pipe.voice_conversion_fused_batch_stream(
            segs, batch=4, depth=2, rng=key, **kw)
        tiny_pipe.enable_batch_sharding()
        assert tiny_pipe._mesh is not None and tiny_pipe._mesh.size == 8
        sharded = tiny_pipe.voice_conversion_fused_batch_stream(
            segs, batch=4, depth=2, rng=key, **kw)
    finally:
        tiny_pipe._mesh = None
        tiny_pipe._repl_cache = {}
        tiny_pipe._rmvpe = None

    assert [len(x) for x in sharded] == [len(x) for x in plain]
    # sharded partitioning changes XLA fusion order: fp reassociation only
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)
