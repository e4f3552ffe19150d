"""Regression tests for round-2 correctness fixes:

  - protect must actually shield pre-retrieval features on unvoiced frames
    (reference rvc/infer/pipeline.py:455-481)
  - filter_radius must median-filter the contour and reach FCPE
    (core.py:669, pipeline.py:370)
  - CLI carries filter_radius + the full hybrid menu (core.py:714-723)
  - balancer log-sigmas survive a save/resume round trip
  - deployable .pth export uses the reference's "weight"/"config" layout
    (extract_model.py:56-106)
"""

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
    return Pipeline(
        SR_MODEL, model, vs["params"], emb, emb_params,
        PipelineConfig(x_pad=1, x_query=2, x_center=8, x_max=10),
        upsample_factor=cfg.upsample_factor,
    )


@pytest.mark.slow
def test_protect_changes_output_with_index(tiny_pipe):
    """protect < 0.5 restores pre-retrieval features on unvoiced frames, so
    the output must differ from protect >= 0.5 when retrieval is active and
    unvoiced frames exist (reference pipeline.py:469-481)."""
    rng = np.random.default_rng(1)
    seg = (rng.normal(size=16000) * 0.1).astype(np.float32)
    n = len(seg) // 160
    pit = np.full(n, 120, np.int32)
    pif = np.full(n, 220.0, np.float32)
    pif[n // 2:] = 0.0          # second half unvoiced
    index_vectors = jnp.asarray(
        rng.normal(size=(64, 768)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)

    out_02 = tiny_pipe.voice_conversion(
        seg, pit, pif, 0, index_vectors, 0.9, 0.2, key
    )
    out_05 = tiny_pipe.voice_conversion(
        seg, pit, pif, 0, index_vectors, 0.9, 0.5, key
    )
    out_09 = tiny_pipe.voice_conversion(
        seg, pit, pif, 0, index_vectors, 0.9, 0.9, key
    )
    # protect < 0.5 blends -> differs from the unprotected outputs
    assert not np.allclose(out_02, out_05, atol=1e-6)
    # protect >= 0.5 disables the blend entirely -> identical outputs
    np.testing.assert_allclose(out_05, out_09, atol=1e-6)


def test_filter_radius_median_filters_contour(tiny_pipe):
    """An odd filter_radius >= 3 median-filters the f0 contour."""
    spiky = np.full(100, 200.0, np.float32)
    spiky[40] = 800.0  # single-frame octave spike

    predictors = {"fake": lambda audio: spiky}
    _, f0_raw = tiny_pipe.get_f0(
        np.zeros(100 * 160, np.float32), 100, 0, "fake", predictors,
        filter_radius=0,
    )
    _, f0_med = tiny_pipe.get_f0(
        np.zeros(100 * 160, np.float32), 100, 0, "fake", predictors,
        filter_radius=3,
    )
    assert f0_raw[40] == pytest.approx(800.0)
    assert f0_med[40] == pytest.approx(200.0)


def test_cli_contract_filter_radius_and_hybrid_menu():
    from rvc_tpu.cli import _collect_infer_kwargs, build_parser

    parser = build_parser()
    for method in ("hybrid[crepe+rmvpe]", "hybrid[crepe+fcpe]",
                   "hybrid[rmvpe+fcpe]", "hybrid[crepe+rmvpe+fcpe]"):
        args = parser.parse_args([
            "infer", "--input_path", "a.wav", "--output_path", "b.wav",
            "--pth_path", "m.npz", "--f0_method", method,
            "--filter_radius", "5",
        ])
        kw = _collect_infer_kwargs(args)
        assert kw["f0_method"] == method
        assert kw["filter_radius"] == 5


def test_fcpe_filter_radius_threshold_and_gap_fill():
    """Fractional filter_radius acts as the FCPE decoder threshold
    (reference fcpe.py:125); unvoiced gaps are interpolated
    (fcpe.py:30-67)."""
    from rvc_tpu.predictors.fcpe import FCPE, CFNaiveMelPE

    model = CFNaiveMelPE(hidden_dims=32, n_layers=1, n_heads=2)
    fcpe = FCPE(model=model)

    audio = (np.sin(2 * np.pi * 220 * np.arange(4800) / 16000)
             .astype(np.float32) * 0.5)
    f0_default = fcpe.compute_f0(audio, p_len=30)
    # threshold 0.999 leaves (almost) nothing voiced -> all zeros survive
    # gap fill only if no frame is voiced
    f0_strict = fcpe.compute_f0(audio, p_len=30, filter_radius=0.999)
    assert f0_default.shape == (30,)
    assert f0_strict.shape == (30,)
    # with random weights the latent is near 0.5 everywhere: the default
    # threshold keeps frames voiced, 0.999 drops them all
    assert np.all(f0_strict == 0.0) or np.all(f0_strict > 0.0)
    # gap interpolation: no isolated zeros between voiced frames
    voiced = f0_default > 0
    if voiced.any():
        first, last = np.argmax(voiced), len(voiced) - np.argmax(voiced[::-1]) - 1
        assert np.all(f0_default[first:last + 1] > 0)


@pytest.mark.slow
def test_predictor_bucketing_compiles_once_per_bucket():
    """Different file lengths in the same 1 s bucket must reuse one XLA
    program (predictors/bucketing.py); a new bucket adds exactly one."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    tiny = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                en_out_channels=2, gru_hidden=4))
    rng = np.random.default_rng(0)
    for t in (15000, 15500, 15999):
        f0 = tiny.infer_from_audio(rng.normal(size=t).astype(np.float32) * 0.1)
        assert len(f0) == t // 160 + 1
    assert tiny._infer._cache_size() == 1
    tiny.infer_from_audio(rng.normal(size=17000).astype(np.float32) * 0.1)
    assert tiny._infer._cache_size() == 2
    # batch API: one program for a group of mixed lengths
    outs = tiny.infer_batch([
        rng.normal(size=t).astype(np.float32) for t in (14000, 15000, 12345)
    ])
    assert [len(o) for o in outs] == [14000 // 160 + 1, 15000 // 160 + 1,
                                      12345 // 160 + 1]
    assert tiny._infer._cache_size() == 3  # batch=3 @ bucket 16000 is new


@pytest.mark.slow
def test_rmvpe_bucketed_matches_frame_count_and_batch():
    """infer_batch == per-file infer_from_audio on identical audio."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    tiny = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                en_out_channels=2, gru_hidden=4))
    rng = np.random.default_rng(1)
    wavs = [rng.normal(size=t).astype(np.float32) * 0.2
            for t in (8000, 12800)]
    singles = [tiny.infer_from_audio(w) for w in wavs]
    batched = tiny.infer_batch(wavs)
    for s, b in zip(singles, batched):
        np.testing.assert_allclose(s, b, atol=1e-2)  # Hz; fp batch noise


def test_flac_native_roundtrip(tmp_path):
    """Native FLAC codec (native/flac_codec.cpp): encode -> decode must be
    bit-exact at 16-bit, for mono/stereo/partial-frame lengths."""
    from rvc_tpu.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    t = np.arange(9000) / 16000
    mono = np.clip(0.5 * np.sin(2 * np.pi * 440 * t)
                   + 0.1 * rng.normal(size=len(t)), -1, 1).astype(np.float32)
    p = str(tmp_path / "m.flac")
    if not native.flac_write(p, mono, 16000):
        pytest.skip("native library unavailable")
    dec, sr = native.flac_read(p)
    assert sr == 16000 and dec.shape == mono.shape
    q16 = np.round(mono * 32767) / 32768
    assert np.abs(dec - q16).max() < 1e-4

    stereo = np.stack([mono, -0.5 * mono], axis=1)
    p2 = str(tmp_path / "s.flac")
    native.flac_write(p2, stereo, 44100)
    dec2, sr2 = native.flac_read(p2)
    assert sr2 == 44100 and dec2.shape == stereo.shape

    from rvc_tpu.utils.audio_io import load_audio

    la = load_audio(p2, 16000)  # flac -> mono -> resample path
    assert la.dtype == np.float32 and len(la) > 0


def test_load_audio_unknown_format_message(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present; decode would succeed")
    from rvc_tpu.utils.audio_io import load_audio

    with pytest.raises(ValueError, match="ffmpeg"):
        load_audio(str(p), 16000)


def test_embedder_registry(tmp_path):
    from rvc_tpu.embedders import EMBEDDER_REGISTRY, resolve_embedder_path

    assert set(EMBEDDER_REGISTRY) == {
        "contentvec", "spin", "chinese-hubert-base",
        "japanese-hubert-base", "korean-hubert-base",
    }
    # named model without a local checkpoint -> None (random-init fallback)
    assert resolve_embedder_path("spin", root=str(tmp_path)) is None
    # named model with a local checkpoint -> its path
    d = tmp_path / "korean_hubert_base"
    d.mkdir()
    ckpt = d / "pytorch_model.bin"
    ckpt.write_bytes(b"x")
    assert resolve_embedder_path(
        "korean-hubert-base", root=str(tmp_path)) == str(ckpt)
    # custom path wins
    assert resolve_embedder_path("custom", str(ckpt)) == str(ckpt)
    with pytest.raises(ValueError):
        resolve_embedder_path("not-a-model")


def test_pesq_wb_estimator():
    """Numpy PESQ-WB (utils/pesq_np.py): identity -> ceiling, monotone in
    noise, delay- and level-invariant, unrelated -> ~1."""
    from rvc_tpu.utils.pesq_np import pesq_wb

    rng = np.random.default_rng(0)
    t = np.arange(16000 * 3) / 16000
    sig = sum(np.sin(2 * np.pi * k * 120 * t) / k for k in range(1, 8))
    ref = (sig * 0.5 * (1 + np.sin(2 * np.pi * 2.5 * t)) * 0.2)

    assert pesq_wb(ref, ref) == pytest.approx(4.64, abs=0.01)
    scores = []
    for snr in (30, 20, 10, 0):
        noise = rng.normal(size=len(ref))
        noise *= np.sqrt(np.mean(ref ** 2) / np.mean(noise ** 2)) * 10 ** (-snr / 20)
        scores.append(pesq_wb(ref, ref + noise))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # calibrated anchors (pesq_np D_SCALE/DA_SCALE fit): the canonical
    # PESQ-WB white-noise curve within loose bands
    assert 3.8 < scores[0] < 4.64     # 30 dB SNR ~ 4.2
    assert 2.6 < scores[1] < 3.9      # 20 dB SNR ~ 3.3
    assert 1.9 < scores[2] < 3.1      # 10 dB SNR ~ 2.5
    assert 1.2 < scores[-1] < 2.2     # 0 dB SNR ~ 1.7
    assert pesq_wb(ref, rng.normal(size=len(ref)) * 0.1) < 1.5
    # global delay (incl. non-multiple-of-64 lags) and level changes are
    # compensated to (near-)ceiling by the two-stage alignment
    delayed = np.concatenate([np.zeros(1600), ref])[: len(ref)]
    assert pesq_wb(ref, delayed) > 4.5
    odd = np.concatenate([np.zeros(137), ref])[: len(ref)]
    assert pesq_wb(ref, odd) > 4.5
    assert pesq_wb(ref, ref * 0.3) > 4.5


def test_pesq_wb_ranks_training_progress():
    """The validation use case (round-5 VERDICT #4): pesq_est must rank a
    converging model's outputs. Proxy: progressive signal/noise mixes
    (alpha=1 -> pure noise ~ an untrained GAN; alpha->0 -> converged) must
    score strictly monotone through the USABLE range. Below ~alpha 0.95
    (SI-SDR < about -20 dB) the score sits at the 1.05-1.1 floor where
    conformant PESQ is also unrankable — that regime is documented in
    docs/PARITY.md, and it is what e2e_r4's 1.059 -> 1.036 'wrong way'
    reading was: two points under the floor."""
    from rvc_tpu.utils.pesq_np import pesq_wb

    rng = np.random.default_rng(1)
    sr = 16000
    t = np.arange(6 * sr) / sr
    f0 = 140 + 30 * np.sin(2 * np.pi * 0.5 * t)
    ph = np.cumsum(2 * np.pi * f0 / sr)
    env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0, 1)
    speech = sum(np.sin(k * ph) / k for k in range(1, 6)) * env * 0.3
    noise = rng.normal(size=len(speech))
    noise *= np.sqrt(np.mean(speech ** 2) / np.mean(noise ** 2))

    scores = []
    for a in (0.0, 0.2, 0.4, 0.6, 0.8, 0.9):
        scores.append(pesq_wb(speech, (1 - a) * speech + a * noise))
    assert all(x > y for x, y in zip(scores, scores[1:])), scores
    assert scores[0] > 4.5          # converged -> ceiling
    assert scores[-1] < 1.6         # mostly-noise -> near floor
    # floor characterization: beyond the usable range the score flattens
    # into the 1.0-1.2 band rather than going negative/undefined
    floor = pesq_wb(speech, noise)
    assert 1.0 <= floor < 1.25


@pytest.mark.slow
def test_fused_conversion_matches_unfused(tiny_pipe):
    """The one-round-trip fused graph (RMVPE f0 + medfilt + autotune +
    quantize + convert) must equal the host-orchestrated path."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    # pin a strongly peaked salience (random weights give a near-uniform
    # salience whose argmax flips under fp jitter between the two traces)
    bias = np.full(360, -6.0, np.float32)
    bias[120] = 6.0
    rmvpe.params = dict(rmvpe.params)
    rmvpe.params["fc"] = {
        "kernel": jnp.zeros_like(rmvpe.params["fc"]["kernel"]),
        "bias": jnp.asarray(bias),
    }

    tt = np.arange(2 * 16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)

    key = jax.random.PRNGKey(3)
    kwargs = dict(
        sid=0, pitch_shift=2, index_rate=0.0, protect=0.4,
        f0_autotune=True, f0_autotune_strength=0.8, filter_radius=3,
        volume_envelope=1.0, rng=key,
    )

    # unfused path must see the SAME samples the fused graph pads to its
    # conversion bucket (zero-extension), so wrap the predictor accordingly
    def host_predictor(a):
        t_pad = tiny_pipe._bucket_len(len(a))
        padded = np.zeros(t_pad, np.float32)
        padded[: len(a)] = a
        return rmvpe.infer_from_audio(padded)[: len(a) // 160 + 1]

    # plain callable (no RMVPE __self__) forces the host-orchestrated path
    out_host = tiny_pipe.pipeline(
        audio, f0_method="rmvpe",
        predictors={"rmvpe": host_predictor}, **kwargs,
    )
    assert tiny_pipe._rmvpe is None
    # fused: bound method carries the model; pipeline attaches it
    out_fused = tiny_pipe.pipeline(
        audio, f0_method="rmvpe",
        predictors={"rmvpe": rmvpe.infer_from_audio}, **kwargs,
    )
    assert tiny_pipe._rmvpe is not None
    assert len(out_host) == len(out_fused)
    np.testing.assert_allclose(out_fused, out_host, atol=2e-3)
    tiny_pipe._rmvpe = None  # leave the shared fixture unfused


def test_export_pth_reference_layout(tmp_path):
    """export_rvc_pth writes 'weight' + the 18-element config list the
    reference loader reads (infer.py:469-483)."""
    torch = pytest.importorskip("torch")
    from rvc_tpu.utils.export_torch import export_rvc_pth

    cfg = _tiny_cfg()
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), posterior_layers=2, flow_layers=1
    )
    t = 12
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
    out = str(tmp_path / "model.pth")
    # no layer-count kwargs: counts must be derived from the params tree
    export_rvc_pth(vs["params"], out, sr=SR_MODEL, cfg=cfg, epoch=3, step=42)
    cpt = torch.load(out, map_location="cpu", weights_only=True)
    assert "weight" in cpt and "model" not in cpt
    assert len(cpt["config"]) == 18
    assert cpt["config"][-1] == SR_MODEL
    assert cpt["config"][0] == cfg.data.filter_length // 2 + 1
    assert cpt["config"][12] == list(cfg.model.upsample_rates)
    assert cpt["sr"] == SR_MODEL and cpt["f0"] == 1
    assert cpt["epoch"] == 3 and cpt["step"] == 42
    assert all(v.dtype == torch.float16 for v in cpt["weight"].values())
    assert not any("enc_q" in k for k in cpt["weight"])

    # and our own importer reads it back (the 'weight' unwrap fix)
    from rvc_tpu.utils.checkpoints import load_rvc_pth

    params, meta = load_rvc_pth(out)
    assert "enc_p" in params and "dec" in params
    assert meta["sr"] == SR_MODEL


@pytest.mark.slow
def test_stream_matches_single_fused(tiny_pipe):
    """voice_conversion_fused_stream and _many must be sample-identical to
    per-file voice_conversion_fused (same program, different dispatch)."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    tiny_pipe.set_rmvpe(rmvpe)
    try:
        tt = np.arange(2 * 16000) / 16000
        files = [
            (0.3 * np.sin(2 * np.pi * f * tt)).astype(np.float32)
            for f in (180.0, 220.0, 260.0)
        ]
        kw = dict(sid=0, index_vectors=None, index_rate=0.0, protect=0.5,
                  pitch_shift=0, filter_radius=3)
        # per-segment rngs must line up: the stream derives segment i's rng
        # as jax.random.split(rng, n)[i] (one batched split dispatch instead
        # of a per-item split — see voice_conversion_fused_stream docstring)
        rng = jax.random.PRNGKey(9)
        subs = list(jax.random.split(rng, len(files)))
        singles = [
            tiny_pipe.voice_conversion_fused(f, rng=sub, **kw)
            for f, sub in zip(files, subs)
        ]
        streamed = tiny_pipe.voice_conversion_fused_stream(
            files, rng=rng, **kw)
        assert len(streamed) == len(singles)
        for a, b in zip(singles, streamed):
            np.testing.assert_array_equal(a, b)
        batched = tiny_pipe.voice_conversion_fused_many(
            files, rng=jax.random.PRNGKey(1), **kw)
        assert [len(x) for x in batched] == [len(x) for x in singles]
    finally:
        tiny_pipe._rmvpe = None


@pytest.mark.slow
def test_pipeline_many_matches_serial(tiny_pipe):
    """pipeline_many (split_audio's dispatch-ahead path) must be
    sample-identical to [pipeline(s) for s in segments] on BOTH routes:
    the fused rmvpe fast path and the generic fallback (yin)."""
    from rvc_tpu.predictors.rmvpe import RMVPE, E2EModel

    tt = np.arange(2 * 16000) / 16000
    segs = [
        (0.3 * np.sin(2 * np.pi * f * tt[:n])).astype(np.float32)
        for f, n in ((180.0, 32000), (220.0, 24000), (260.0, 30000))
    ]

    # fused fast path (rmvpe attached)
    rmvpe = RMVPE(model=E2EModel(n_blocks=1, en_de_layers=2, inter_layers=1,
                                 en_out_channels=2, gru_hidden=4))
    tiny_pipe.set_rmvpe(rmvpe)
    try:
        kw = dict(sid=0, f0_method="rmvpe", index_rate=0.0, protect=0.4,
                  volume_envelope=0.8, pitch_shift=2)
        many = tiny_pipe.pipeline_many(segs, **kw)
        serial = [tiny_pipe.pipeline(s, **kw) for s in segs]
        assert len(many) == len(serial)
        for a, b in zip(many, serial):
            np.testing.assert_array_equal(a, b)
    finally:
        tiny_pipe._rmvpe = None
        tiny_pipe._convert_fused = None

    # fallback path (yin -> serial loop inside pipeline_many)
    kw = dict(sid=0, f0_method="yin", index_rate=0.0, protect=0.5)
    many = tiny_pipe.pipeline_many(segs[:2], **kw)
    serial = [tiny_pipe.pipeline(s, **kw) for s in segs[:2]]
    for a, b in zip(many, serial):
        np.testing.assert_array_equal(a, b)
