"""End-to-end slow tests: full inference Pipeline and a tiny training run.

These exercise the real orchestration paths (chunking, f0, retrieval, RMS
mixing; epoch loop, checkpoint save/resume) with miniature models on CPU."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer

pytestmark = pytest.mark.slow

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
    """Minimal stand-in with the FlaxHubert call signature: [B, T16k] ->
    [B, (T-400)//320+1, 768]."""

    def apply(self, variables, audio):
        b, t = audio.shape
        n = (t - 400) // 320 + 1
        frames = jax.lax.conv_general_dilated_patches(
            audio[:, None, :], filter_shape=(400,), window_strides=(320,),
            padding="VALID",
        )[:, :, :n]
        frames = jnp.transpose(frames, (0, 2, 1))  # [B, n, 400]
        proj = variables["params"]["proj"]
        return jnp.matmul(frames, proj, preferred_element_type=jnp.float32)


def test_full_inference_pipeline():
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig

    cfg = _tiny_cfg()
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1
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

    pipe = Pipeline(
        SR_MODEL, model, vs["params"], emb, emb_params,
        PipelineConfig(x_pad=1, x_query=2, x_center=8, x_max=10),
        upsample_factor=cfg.upsample_factor,
    )

    # 3 s of 16k audio with tone + silence; index retrieval active
    tt = np.arange(3 * 16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    index_vectors = rng.normal(size=(64, 768)).astype(np.float32)

    out = pipe.pipeline(
        audio, sid=0, pitch_shift=2, f0_method="yin",
        index_vectors=index_vectors, index_rate=0.5,
        volume_envelope=0.8, protect=0.3, f0_autotune=True,
    )
    # output at model rate (320 samples/frame * 100 frames/sec = 32k)
    expected = len(audio) / 16000 * SR_MODEL
    assert abs(len(out) - expected) / expected < 0.1
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0


def test_trainer_one_epoch_and_resume(tmp_path):
    from rvc_tpu.train.data import FileListRow
    from rvc_tpu.train.trainer import Trainer, TrainerArgs
    from rvc_tpu.utils.audio_io import write_wav

    cfg = _tiny_cfg()
    exp = tmp_path / "exp"
    exp.mkdir()

    # synthesize a 4-example dataset at the model rate
    rows = []
    rng = np.random.default_rng(0)
    n_frames = 30
    hop = cfg.data.hop_length
    for i in range(4):
        wav = (rng.normal(size=n_frames * hop) * 0.1).astype(np.float32)
        wp = str(exp / f"0_{i}.wav")
        write_wav(wp, wav, SR_MODEL, subtype="FLOAT")
        feats = rng.normal(size=(n_frames // 2, 768)).astype(np.float32)
        f0c = rng.integers(1, 255, size=n_frames).astype(np.int64)
        f0f = (rng.random(n_frames) * 300).astype(np.float32)
        fp, cp, vp = str(exp / f"f{i}.npy"), str(exp / f"c{i}.npy"), str(exp / f"v{i}.npy")
        np.save(fp, feats); np.save(cp, f0c); np.save(vp, f0f)
        rows.append(f"{wp}|{fp}|{cp}|{vp}|0")
    (exp / "filelist.txt").write_text("\n".join(rows) + "\n")

    args = TrainerArgs(exp_dir=str(exp), total_epochs=1, save_every_epoch=1)
    trainer = Trainer(cfg, args)
    # shrink the models for CPU
    trainer.model_g = dataclasses.replace(
        trainer.model_g, posterior_layers=2, flow_layers=1
    )
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator

    trainer.model_d = MultiPeriodDiscriminator(periods=(2,))
    trainer.step_fn = __import__(
        "rvc_tpu.train.step", fromlist=["make_train_step"]
    ).make_train_step(
        trainer.cfg, trainer.model_g, trainer.model_d, trainer.tx_g,
        trainer.tx_d, trainer.steps_per_epoch,
    )
    from rvc_tpu.parallel import make_mesh, shard_train_step

    trainer.jstep = shard_train_step(trainer.step_fn, trainer.mesh)
    trainer.fit()

    assert os.path.exists(exp / "G_1.npz")
    assert os.path.exists(exp / "D_1.npz")
    # reference-interop full ckpts (strict-loadable by the reference's
    # pretrained G/D paths; see utils/export_torch.py)
    assert os.path.exists(exp / "G_1.pth")
    assert os.path.exists(exp / "D_1.pth")
    deploy = [p for p in os.listdir(exp) if p.endswith("_1e.npz")]
    assert deploy, "deployable export missing"
    assert os.path.exists(exp / "metrics.jsonl")

    # resume picks up epoch 1
    trainer2 = Trainer(cfg, dataclasses.replace(args, total_epochs=1))
    trainer2.model_g = trainer.model_g
    trainer2.model_d = trainer.model_d
    trainer2.init_state()
    assert trainer2.start_epoch == 2


def test_batched_segment_conversion_matches_single():
    """convert_segments_batch must equal per-segment voice_conversion."""
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig

    cfg = _tiny_cfg()
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1,
        zero_noise=True,  # determinism so batch == single exactly
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
    pipe = Pipeline(
        SR_MODEL, model, vs["params"], emb, emb_params,
        PipelineConfig(x_pad=1, x_query=2, x_center=8, x_max=10),
        upsample_factor=cfg.upsample_factor,
    )

    tt = np.arange(16000) / 16000
    seg_a = (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    seg_b = (0.2 * np.sin(2 * np.pi * 330 * tt[:12000])).astype(np.float32)
    n_a, n_b = len(seg_a) // 160, len(seg_b) // 160
    pit_a = np.full(n_a, 120, np.int32); pif_a = np.full(n_a, 220.0, np.float32)
    pit_b = np.full(n_b, 150, np.int32); pif_b = np.full(n_b, 330.0, np.float32)

    key = jax.random.PRNGKey(7)
    batch_out = pipe.convert_segments_batch(
        [seg_a, seg_b], [pit_a, pit_b], [pif_a, pif_b], [0, 0],
        None, 0.0, 0.5, key,
    )
    single_a = pipe.voice_conversion(seg_a, pit_a, pif_a, 0, None, 0.0, 0.5, key)
    single_b = pipe.voice_conversion(seg_b, pit_b, pif_b, 0, None, 0.0, 0.5, key)
    assert len(batch_out[0]) == len(single_a)
    assert len(batch_out[1]) == len(single_b)
    np.testing.assert_allclose(batch_out[0], single_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(batch_out[1], single_b, rtol=1e-4, atol=1e-5)


def test_streamed_long_audio_matches_serial():
    """voice_conversion_stream (the windowed >t_max path's pipelined
    dispatcher) must be bit-identical to per-segment voice_conversion, and
    pipeline() on long audio must produce the same as the serial
    composition."""
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig

    cfg = _tiny_cfg()
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1,
        zero_noise=True,
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
    pipe = Pipeline(
        SR_MODEL, model, vs["params"], emb, emb_params,
        PipelineConfig(x_pad=1, x_query=2, x_center=4, x_max=5),
        upsample_factor=cfg.upsample_factor,
    )

    # three segments of different lengths, with and without pitch
    tt = np.arange(16000 * 2) / 16000
    segs = [
        (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32),
        (0.2 * np.sin(2 * np.pi * 330 * tt[:24000])).astype(np.float32),
        (0.25 * np.sin(2 * np.pi * 180 * tt[:17500])).astype(np.float32),
    ]
    pits = [np.full(len(s) // 160, 120, np.int32) for s in segs]
    pifs = [np.full(len(s) // 160, 220.0, np.float32) for s in segs]
    subs = list(jax.random.split(jax.random.PRNGKey(3), len(segs)))

    streamed = pipe.voice_conversion_stream(
        segs, pits, pifs, 0, None, 0.0, 0.5, subs, depth=2,
    )
    for i, (seg, pit, pif, sub) in enumerate(zip(segs, pits, pifs, subs)):
        serial = pipe.voice_conversion(seg, pit, pif, 0, None, 0.0, 0.5, sub)
        np.testing.assert_array_equal(streamed[i], serial)

    # integration: >t_max audio routes through the streamed path
    long_audio = np.concatenate(segs + segs)  # ~11.6 s > t_max=5 s
    out = pipe.pipeline(long_audio, sid=0, pitch_shift=0, f0_method="yin")
    expected = len(long_audio) / 16000 * SR_MODEL
    assert abs(len(out) - expected) / expected < 0.1
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
