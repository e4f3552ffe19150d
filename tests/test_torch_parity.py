"""Numerical parity vs the reference torch implementation (/root/reference).

Each test instantiates the reference's OWN torch modules with seeded random
weights, converts them through our checkpoint converters, and diffs forward
outputs — proving that real reference checkpoints (rmvpe.pt, fcpe.pt,
deployable .pth models) load into this framework bit-faithfully.

Covered:      Synthesizer.infer (all 3 vocoders + rate arg + training fwd),
              RMVPE end-to-end, torchfcpe CFNaiveMelPE (full conformer with
              Performer/FAVOR+ attention, plus conv_only) + mel front +
              local-argmax decoder, mel_processing numerics
              (spectrogram / mel / multi-scale loss).
Not covered:  torchcrepe forward (wheel absent in this env — the converter
              is validated against a vendored state-dict manifest instead,
              see test_crepe_layout below / tests/golden).

librosa is stubbed with the reference's own vendored copy
(torchfcpe/mel_fn_librosa.py), so filterbank parity is tested against a
genuine librosa implementation. See tests/_reference_compat.py.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import _reference_compat as rc  # noqa: E402

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
rc.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# highest precision so parity thresholds measure design, not matmul rounding
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# synthesizer
# ---------------------------------------------------------------------------

TINY = dict(
    spec_channels=257, segment_size=32, inter_channels=8, hidden_channels=8,
    filter_channels=16, n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
    resblock="1", resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[16, 10, 2], upsample_initial_channel=16,
    upsample_kernel_sizes=[32, 20, 4], spk_embed_dim=4, gin_channels=8,
    sr=32000, use_f0=True,
)


def _build_pair(vocoder: str, gin: int):
    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth

    from rvc_tpu.models.synthesizer import Synthesizer as FlaxSynth
    from rvc_tpu.utils.checkpoints import convert_torch_synthesizer

    torch.manual_seed(0)
    dims = dict(TINY, gin_channels=gin, vocoder=vocoder)
    tm = TorchSynth(**dims).eval()
    params = convert_torch_synthesizer(
        tm.state_dict(), n_enc_layers=2, n_ups=3, num_kernels=1, vocoder=vocoder
    )
    fm = FlaxSynth(
        spec_channels=257, segment_size=32, inter_channels=8, hidden_channels=8,
        filter_channels=16, n_heads=2, n_layers=2, kernel_size=3,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(16, 10, 2), upsample_initial_channel=16,
        upsample_kernel_sizes=(32, 20, 4), spk_embed_dim=4, gin_channels=gin,
        sr=32000, use_f0=True, vocoder=vocoder, zero_noise=True,
    )
    return tm, fm, params


def _infer_inputs(T=20, seed=1):
    rng = np.random.default_rng(seed)
    phone = rng.normal(size=(1, T, 768)).astype(np.float32)
    pitch = rng.integers(1, 255, size=(1, T)).astype(np.int64)
    nsff0 = (rng.random((1, T)).astype(np.float32) * 300)
    nsff0[0, T // 2:] = 0.0
    return phone, pitch, nsff0, np.array([T], np.int64), np.array([1], np.int64)


def _run_infer_pair(tm, fm, params, rate=None):
    from rvc_tpu.models.synthesizer import Synthesizer as FlaxSynth

    phone, pitch, nsff0, lengths, sid = _infer_inputs()
    with torch.no_grad(), rc.zero_torch_noise():
        o_ref = tm.infer(
            torch.from_numpy(phone), torch.from_numpy(lengths),
            torch.from_numpy(pitch), torch.from_numpy(nsff0),
            torch.from_numpy(sid),
            rate=torch.tensor(rate) if rate is not None else None,
        )[0].numpy()[0, 0]
    o_our, _ = fm.apply(
        {"params": params},
        jnp.asarray(phone), jnp.asarray(lengths, jnp.int32),
        jnp.asarray(pitch, jnp.int32), jnp.asarray(nsff0),
        jnp.asarray(sid, jnp.int32),
        method=FlaxSynth.infer, rngs={"noise": jax.random.PRNGKey(0)},
        rate=rate,
    )
    o_our = np.asarray(o_our)[0, :, 0]
    n = min(len(o_ref), len(o_our))
    assert n > 0
    rel = np.abs(o_ref[:n] - o_our[:n]).max() / max(np.abs(o_ref).max(), 1e-9)
    return len(o_ref), len(o_our), rel


@pytest.mark.parametrize("vocoder,gin,tol", [
    ("HiFi-GAN", 8, 5e-4),
    ("MRF HiFi-GAN", 8, 5e-4),
    # reference RefineGAN hardcodes a 256-ch cond conv (refinegan.py:340)
    ("RefineGAN", 256, 5e-4),
])
def test_synthesizer_infer_parity(vocoder, gin, tol):
    tm, fm, params = _build_pair(vocoder, gin)
    n_ref, n_our, rel = _run_infer_pair(tm, fm, params)
    assert n_ref == n_our
    assert rel < tol, f"{vocoder}: rel err {rel:.2e}"


def test_synthesizer_infer_rate_parity():
    """The streaming `rate` head-trim must match synthesizers.py:250-253."""
    tm, fm, params = _build_pair("HiFi-GAN", 8)
    n_ref, n_our, rel = _run_infer_pair(tm, fm, params, rate=0.5)
    assert n_ref == n_our
    assert rel < 5e-4


def test_synthesizer_training_forward_parity():
    """Training forward (posterior + flow fwd + slice + decode) in zero-noise:
    z = m_q (posterior sample zeroed), slice ids = 0 (torch.rand zeroed)."""
    from rvc_tpu.models.synthesizer import Synthesizer as FlaxSynth

    tm, fm, params = _build_pair("HiFi-GAN", 8)
    T = 40
    rng = np.random.default_rng(2)
    phone = rng.normal(size=(1, T, 768)).astype(np.float32)
    pitch = rng.integers(1, 255, size=(1, T)).astype(np.int64)
    pitchf = (rng.random((1, T)).astype(np.float32) * 300)
    spec = np.abs(rng.normal(size=(1, 257, T))).astype(np.float32)
    lengths = np.array([T], np.int64)
    sid = np.array([1], np.int64)

    with torch.no_grad(), rc.zero_torch_noise():
        o_ref, ids_ref, _, _, vae_ref = tm(
            torch.from_numpy(phone), torch.from_numpy(lengths),
            torch.from_numpy(pitch), torch.from_numpy(pitchf),
            torch.from_numpy(spec), torch.from_numpy(lengths),
            torch.from_numpy(sid),
        )
    o_ref = o_ref.numpy()[0, 0]

    out = fm.apply(
        {"params": params},
        jnp.asarray(phone), jnp.asarray(lengths, jnp.int32),
        jnp.asarray(pitch, jnp.int32), jnp.asarray(pitchf),
        jnp.asarray(np.transpose(spec, (0, 2, 1))),  # ours is NTC
        jnp.asarray(lengths, jnp.int32), jnp.asarray(sid, jnp.int32),
        ids_slice=jnp.zeros((1,), jnp.int32),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    o_our = np.asarray(out[0])[0, :, 0]
    assert int(ids_ref[0]) == 0
    n = min(len(o_ref), len(o_our))
    rel = np.abs(o_ref[:n] - o_our[:n]).max() / max(np.abs(o_ref).max(), 1e-9)
    assert rel < 5e-4, f"training fwd rel err {rel:.2e}"


# ---------------------------------------------------------------------------
# RMVPE
# ---------------------------------------------------------------------------

def test_rmvpe_end_to_end_parity(tmp_path):
    """Full infer_from_audio chain vs the reference RMVPE0Predictor
    (RMVPE.py:420-512) with a random-weight E2E(4, 1, (2, 2))."""
    from rvc.lib.predictors.RMVPE import E2E, RMVPE0Predictor

    from rvc_tpu.predictors.rmvpe import RMVPE

    torch.manual_seed(0)
    pt = str(tmp_path / "rmvpe.pt")
    torch.save(E2E(4, 1, (2, 2)).state_dict(), pt)
    ref = RMVPE0Predictor(pt, device="cpu")
    ours = RMVPE.from_torch_checkpoint(pt)

    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.normal(size=len(t))).astype(np.float32)
    f0_ref = ref.infer_from_audio(audio, thred=0.03)
    f0_our = ours.infer_from_audio(audio, thred=0.03)
    n = min(len(f0_ref), len(f0_our))
    assert abs(len(f0_ref) - len(f0_our)) <= 1
    d = np.abs(f0_ref[:n] - f0_our[:n])
    assert d.max() < 0.1, f"RMVPE f0 max err {d.max():.4f} Hz"


# ---------------------------------------------------------------------------
# FCPE (torchfcpe)
# ---------------------------------------------------------------------------

def test_fcpe_mel_front_parity():
    """fcpe_mel vs torchfcpe MelModule (mel_extractor.py:95-152)."""
    from rvc.lib.predictors.torchfcpe.mel_extractor import MelModule

    from rvc_tpu.predictors.fcpe import fcpe_mel

    rng = np.random.default_rng(5)
    audio = rng.normal(size=16000).astype(np.float32) * 0.2
    mm = MelModule(16000, 128, 1024, 1024, 160, 0, 8000)
    with torch.no_grad():
        mel_ref = mm(torch.from_numpy(audio[None, :, None])).numpy()
    mel_our = np.asarray(fcpe_mel(jnp.asarray(audio[None])))
    assert mel_ref.shape == mel_our.shape
    assert np.abs(mel_ref - mel_our).max() < 1e-3


def test_fcpe_full_conformer_parity(tmp_path):
    """CFNaiveMelPE forward with the real Performer (FAVOR+) attention
    (model_conformer_naive.py:184-372) — the bundled fcpe.pt architecture.
    The projection_matrix buffer is carried through the checkpoint, so our
    FAVOR+ must reproduce torch's random-feature outputs, not just
    approximate softmax."""
    from rvc.lib.predictors.torchfcpe.models import CFNaiveMelPE as TorchPE

    from rvc_tpu.predictors.fcpe import FCPE

    for use_fa_norm in (False, True):
        torch.manual_seed(0)
        tm = TorchPE(
            input_channels=128, out_dims=360, hidden_dims=64, n_layers=2,
            n_heads=2, f0_max=1975.5, f0_min=32.70, conv_only=False,
            use_fa_norm=use_fa_norm,
        ).eval()
        pt = str(tmp_path / f"fcpe_full_{use_fa_norm}.pt")
        torch.save({
            "model": tm.state_dict(),
            "config_dict": {"model": {"n_heads": 2,
                                      "use_fa_norm": use_fa_norm}},
        }, pt)
        ours = FCPE.from_torch_checkpoint(pt)
        assert not ours.model.conv_only and ours.model.n_heads == 2
        assert ours.model.use_fa_norm == use_fa_norm

        rng = np.random.default_rng(7)
        mel = rng.normal(size=(1, 96, 128)).astype(np.float32)
        with torch.no_grad():
            lat_ref = tm(torch.from_numpy(mel)).numpy()
        lat_our = np.asarray(ours.model.apply({"params": ours.params},
                                              jnp.asarray(mel)))
        err = np.abs(lat_ref - lat_our).max()
        assert err < 1e-3, f"Performer parity (use_fa_norm={use_fa_norm}): {err}"


def test_fcpe_model_and_decoder_parity(tmp_path):
    """CFNaiveMelPE forward (conv_only variant) + the local-argmax cents
    decoder (models.py:149-180)."""
    from rvc.lib.predictors.torchfcpe.models import CFNaiveMelPE as TorchPE

    from rvc_tpu.predictors.fcpe import FCPE, decode_latent

    torch.manual_seed(0)
    tm = TorchPE(input_channels=128, out_dims=360, hidden_dims=64, n_layers=2,
                 n_heads=2, f0_max=1975.5, f0_min=32.70, conv_only=True).eval()
    pt = str(tmp_path / "fcpe.pt")
    torch.save({"model": tm.state_dict()}, pt)
    ours = FCPE.from_torch_checkpoint(pt)
    assert ours.model.conv_only and ours.model.n_layers == 2

    rng = np.random.default_rng(5)
    mel = rng.normal(size=(1, 64, 128)).astype(np.float32)
    with torch.no_grad():
        lat_ref = tm(torch.from_numpy(mel)).numpy()
    lat_our = np.asarray(ours.model.apply({"params": ours.params},
                                          jnp.asarray(mel)))
    assert np.abs(lat_ref - lat_our).max() < 1e-3

    with torch.no_grad():
        cents = tm.latent2cents_local_decoder(
            torch.from_numpy(lat_ref), threshold=0.05
        ).numpy()[0, :, 0]
    f0_ref = np.where(cents > 0, 10 * 2 ** (cents / 1200), 0.0)
    f0_our = np.asarray(decode_latent(jnp.asarray(lat_ref[0]), 0.05))
    assert np.abs(np.nan_to_num(f0_ref) - f0_our).max() < 0.01


# ---------------------------------------------------------------------------
# mel_processing numerics
# ---------------------------------------------------------------------------

def test_mel_filterbank_parity():
    from librosa.filters import mel as librosa_mel

    from rvc_tpu.ops.mel import mel_filterbank

    for (sr, n_fft, n_mels, fmin, fmax, htk) in [
        (48000, 2048, 128, 0.0, None, False),
        (32000, 1024, 80, 0.0, None, False),
        (16000, 1024, 128, 30.0, 8000.0, True),
        (16000, 1024, 128, 0.0, 8000.0, False),
    ]:
        ref = librosa_mel(sr=sr, n_fft=n_fft, n_mels=n_mels,
                          fmin=fmin, fmax=fmax, htk=htk)
        ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)
        assert np.abs(ref - ours).max() < 1e-7


def test_spectrogram_and_mel_parity():
    from rvc.train import mel_processing as MP

    from rvc_tpu.ops.stft import mel_spectrogram, spectrogram

    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 48000)).astype(np.float32) * 0.3
    yt = torch.from_numpy(y)
    n_fft, hop, win = 2048, 480, 2048
    spec_ref = MP.spectrogram_torch(yt, n_fft, hop, win).numpy()
    spec_our = np.asarray(spectrogram(jnp.asarray(y), n_fft, hop, win))
    assert np.abs(spec_ref - spec_our.transpose(0, 2, 1)).max() < 1e-4

    mel_ref = MP.mel_spectrogram_torch(
        yt, n_fft, 128, 48000, hop, win, 0.0, None
    ).numpy()
    mel_our = np.asarray(mel_spectrogram(
        jnp.asarray(y), n_fft, 128, 48000, hop, win, 0.0, None
    ))
    assert np.abs(mel_ref - mel_our.transpose(0, 2, 1)).max() < 1e-4


def test_multiscale_mel_loss_parity():
    from rvc.train.mel_processing import MultiScaleMelSpectrogramLoss

    from rvc_tpu.train.losses import multiscale_mel_loss

    rng = np.random.default_rng(0)
    real = rng.normal(size=(2, 17280)).astype(np.float32) * 0.3
    fake = real + rng.normal(size=real.shape).astype(np.float32) * 0.05
    ref = MultiScaleMelSpectrogramLoss(sample_rate=48000)(
        torch.from_numpy(real[:, None]), torch.from_numpy(fake[:, None])
    ).item()
    ours = float(multiscale_mel_loss(
        jnp.asarray(real), jnp.asarray(fake), 48000
    ))
    assert abs(ref - ours) / abs(ref) < 1e-4


# ---------------------------------------------------------------------------
# end-to-end voice_conversion (reference Pipeline glue code)
# ---------------------------------------------------------------------------

class _ExactIndex:
    """faiss stand-in: exact k-NN returning squared L2 distances, the same
    contract index.search has in the reference (pipeline.py:497-507)."""

    def __init__(self, vectors: np.ndarray):
        self.vectors = vectors

    def search(self, npy: np.ndarray, k: int):
        d2 = (
            np.sum(npy ** 2, axis=1, keepdims=True)
            - 2.0 * npy @ self.vectors.T
            + np.sum(self.vectors ** 2, axis=1)[None, :]
        )
        ix = np.argsort(d2, axis=1)[:, :k]
        score = np.take_along_axis(d2, ix, axis=1)
        return score.astype(np.float32), ix


def test_voice_conversion_end_to_end_parity():
    """The full per-segment conversion path — HuBERT features, retrieval
    blend, x2 interpolation, protect blend, length trimming, synthesizer —
    against the reference's own Pipeline.voice_conversion
    (rvc/infer/pipeline.py:412-494) with shared seeded weights."""
    import transformers

    from rvc.infer.pipeline import Pipeline as RefPipeline

    from rvc_tpu.embedders import FlaxHubert, HubertConfig, convert_torch_hubert
    from rvc_tpu.infer.pipeline import Pipeline, PipelineConfig

    # shared hubert (2 transformer layers keep the CPU cost sane; the full
    # 12-layer parity is tests/test_hubert.py)
    torch.manual_seed(0)
    t_hub = transformers.HubertModel(
        transformers.HubertConfig(num_hidden_layers=2)
    ).eval()
    cfg_h = HubertConfig(num_layers=2)
    hub_params = convert_torch_hubert(t_hub.state_dict(), cfg_h)

    tm, fm, synth_params = _build_pair("HiFi-GAN", 8)

    rng = np.random.default_rng(5)
    audio0 = (rng.normal(size=16000) * 0.1).astype(np.float32)
    p_len = 16000 // 160
    pitch_np = rng.integers(1, 255, size=p_len).astype(np.int64)
    pitchf_np = (rng.random(p_len).astype(np.float32) * 300.0)
    pitchf_np[60:] = 0.0  # unvoiced tail exercises the protect blend
    big_npy = rng.normal(size=(512, 768)).astype(np.float32)
    index_rate, protect, sid = 0.6, 0.3, 1

    # reference side: bypass __init__ (it loads rmvpe.pt from disk)
    ref = RefPipeline.__new__(RefPipeline)
    ref.device = "cpu"
    ref.window = 160
    with torch.no_grad(), rc.zero_torch_noise():
        o_ref = ref.voice_conversion(
            t_hub, tm, torch.tensor([sid]), audio0,
            torch.from_numpy(pitch_np)[None],
            torch.from_numpy(pitchf_np)[None],
            _ExactIndex(big_npy), big_npy, index_rate, "v2", protect,
        )

    pipe = Pipeline(
        32000, fm, synth_params, FlaxHubert(cfg_h), hub_params,
        PipelineConfig(x_pad=1), upsample_factor=320, precision="fp32",
    )
    o_our = pipe.voice_conversion(
        audio0, pitch_np.astype(np.int32), pitchf_np, sid,
        jnp.asarray(big_npy), index_rate, protect, jax.random.PRNGKey(0),
    )

    # length: the reference clamps p_len to the hubert frame count of the
    # UNPADDED segment (pipeline.py:466), synthesizing 98 frames for 1 s;
    # our graph pads to the bucket first, so features cover all 100 frames
    # and nothing is cropped. Allow those two trailing hubert frames, and
    # compare the first 90 frames — beyond that the decoder's receptive
    # field sees the differing tail context (reference: zero padding; ours:
    # real features from the padded audio). Measured: frames 0-90 agree at
    # <=5e-3 (the compounded hubert tolerance); 90-100 diverge only from
    # that boundary-context difference.
    assert abs(len(o_ref) - len(o_our)) <= 2 * 320
    n = 90 * 320
    rel = np.abs(o_ref[:n] - np.asarray(o_our)[:n]).max() / (
        np.abs(o_ref).max() + 1e-9
    )
    assert rel < 6e-3, rel


# ---------------------------------------------------------------------------
# discriminator (pretrained f0D*.pth import path)
# ---------------------------------------------------------------------------


def test_mpd_parity():
    """Seeded reference MultiPeriodDiscriminator -> convert_torch_mpd ->
    flax MPD must reproduce logits and feature maps (the pretrain_d import,
    reference discriminators.py:9-148 / train.py pretrained D load)."""
    from rvc.lib.algorithm.discriminators import (
        MultiPeriodDiscriminator as TorchMPD,
    )

    from rvc_tpu.models.discriminators import (
        MultiPeriodDiscriminator as FlaxMPD,
    )
    from rvc_tpu.utils.checkpoints import convert_torch_mpd

    torch.manual_seed(0)
    tm = TorchMPD().eval()
    params = convert_torch_mpd(tm.state_dict())

    rng = np.random.default_rng(0)
    wav_r = rng.normal(size=(2, 1, 3700)).astype(np.float32) * 0.1
    wav_g = rng.normal(size=(2, 1, 3700)).astype(np.float32) * 0.1
    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = tm(
            torch.from_numpy(wav_r), torch.from_numpy(wav_g)
        )

    fm = FlaxMPD()
    r, g, fr, fg = fm.apply(
        {"params": params},
        jnp.asarray(wav_r.transpose(0, 2, 1)),
        jnp.asarray(wav_g.transpose(0, 2, 1)),
    )
    assert len(r) == len(r_ref) == 9
    for ours, ref in ((r, r_ref), (g, g_ref)):
        for a, b in zip(ours, ref):
            b = b.numpy()
            rel = np.abs(np.asarray(a) - b).max() / max(np.abs(b).max(), 1e-9)
            assert rel < 5e-4, rel
    # spot-check one fmap per disc (layouts differ: ours NT..C, torch NC..T)
    for fa, fb in zip(fr, fr_ref):
        a = np.asarray(fa[-1])  # conv_post pre-flatten
        b = fb[-1].numpy()
        if a.ndim == 3:   # [B, T, C] vs [B, C, T]
            a = a.transpose(0, 2, 1)
        else:             # [B, T//p, p, C] vs [B, C, T//p, p]
            a = a.transpose(0, 3, 1, 2)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 5e-4, rel


def test_load_rvc_pth_dispatches_discriminator(tmp_path):
    """A pretrained f0D*.pth ({'model': mpd_state_dict}) must route to
    convert_torch_mpd, not the synthesizer converter (trainer pretrain_d)."""
    from rvc.lib.algorithm.discriminators import (
        MultiPeriodDiscriminator as TorchMPD,
    )

    from rvc_tpu.models.discriminators import (
        MultiPeriodDiscriminator as FlaxMPD,
    )
    from rvc_tpu.utils.checkpoints import load_rvc_pth

    torch.manual_seed(1)
    tm = TorchMPD()
    path = str(tmp_path / "f0D_test.pth")
    # real full-D layout: rvc/train/utils.py save_checkpoint
    torch.save({"model": tm.state_dict(), "iteration": 3,
                "optimizer": {}, "learning_rate": 1e-4}, path)
    params, meta = load_rvc_pth(path)
    assert meta.get("epoch") == 3
    assert meta.get("learning_rate") == 1e-4

    wav = jnp.zeros((1, 512, 1), jnp.float32)
    ref_shapes = jax.tree.map(
        jnp.shape, FlaxMPD().init(jax.random.PRNGKey(0), wav, wav)["params"]
    )
    got_shapes = jax.tree.map(jnp.shape, params)
    assert ref_shapes == got_shapes


def test_mpd_export_roundtrip(tmp_path):
    """Flax MPD params -> export_rvc_d_pth -> reference torch MPD loads the
    state_dict strictly AND reproduces our logits (the switch-back path)."""
    from rvc.lib.algorithm.discriminators import (
        MultiPeriodDiscriminator as TorchMPD,
    )

    from rvc_tpu.models.discriminators import (
        MultiPeriodDiscriminator as FlaxMPD,
    )
    from rvc_tpu.utils.export_torch import export_rvc_d_pth

    fm = FlaxMPD()
    wav = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 2048, 1)), jnp.float32
    )
    params = fm.init(jax.random.PRNGKey(7), wav, wav)["params"]
    path = str(tmp_path / "D_export.pth")
    export_rvc_d_pth(params, path, epoch=5)

    cpt = torch.load(path, map_location="cpu", weights_only=True)
    tm = TorchMPD()
    tm.load_state_dict(cpt["model"], strict=True)
    tm.eval()
    assert cpt["iteration"] == 5

    r_ours, _, _, _ = fm.apply({"params": params}, wav, wav)
    with torch.no_grad():
        wt = torch.from_numpy(np.asarray(wav).transpose(0, 2, 1))
        r_ref, _, _, _ = tm(wt, wt)
    for a, b in zip(r_ours, r_ref):
        b = b.numpy()
        rel = np.abs(np.asarray(a) - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 5e-4, rel


def test_full_g_export_strict_loads_in_reference(tmp_path):
    """Full-format G export must strict-load into the reference Synthesizer
    and reproduce the original state dict exactly (train.py:755-765 is a
    strict load, so any key/shape drift breaks reference fine-tuning)."""
    from rvc.lib.algorithm.synthesizers import Synthesizer as TorchSynth

    from rvc_tpu.utils.checkpoints import convert_torch_synthesizer
    from rvc_tpu.utils.export_torch import export_rvc_g_pth

    torch.manual_seed(0)
    tm = TorchSynth(**TINY, vocoder="HiFi-GAN")
    ref_sd = {k: v.clone() for k, v in tm.state_dict().items()}

    params = convert_torch_synthesizer(
        ref_sd, n_enc_layers=TINY["n_layers"], n_ups=3, num_kernels=1,
    )
    path = str(tmp_path / "G_full.pth")
    export_rvc_g_pth(params, path, epoch=7,
                     n_enc_layers=TINY["n_layers"],
                     wn_layers_posterior=16, wn_layers_flow=3)

    cpt = torch.load(path, map_location="cpu", weights_only=True)
    assert cpt["iteration"] == 7
    tm2 = TorchSynth(**TINY, vocoder="HiFi-GAN")
    tm2.load_state_dict(cpt["model"], strict=True)
    for k, v in tm2.state_dict().items():
        np.testing.assert_allclose(
            v.numpy(), ref_sd[k].numpy(), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_convert_torch_mpd_infers_v1_layout():
    """A 6-module MPD (v1: DiscriminatorS + periods 2,3,5,7,11) must map to
    disc_p2..disc_p11; an unknown module count must raise, not KeyError."""
    from rvc.lib.algorithm.discriminators import (
        MultiPeriodDiscriminator as TorchMPD,
    )

    from rvc_tpu.utils.checkpoints import convert_torch_mpd

    torch.manual_seed(2)
    full = TorchMPD().state_dict()
    v1 = {k: v for k, v in full.items()
          if int(k.split(".")[1]) < 6}
    params = convert_torch_mpd(v1)
    assert set(params) == {"disc_s", "disc_p2", "disc_p3", "disc_p5",
                           "disc_p7", "disc_p11"}

    v_bad = {k: v for k, v in full.items() if int(k.split(".")[1]) < 4}
    with pytest.raises(ValueError, match="unrecognized MPD layout"):
        convert_torch_mpd(v_bad)
    with pytest.raises(ValueError, match="sub-discriminators"):
        convert_torch_mpd(v1, periods=(2, 3))


# ---------------------------------------------------------------------------
# CREPE (torchcrepe layout)
# ---------------------------------------------------------------------------

class _TorchCrepe(torch.nn.Module):
    """Seeded reimplementation of the published torchcrepe Crepe layout
    (github.com/maxrmorrison/torchcrepe model.py — the checkpoint format
    rvc/infer/pipeline.py:212-259 consumes): 6 Conv2d blocks with
    F.pad->conv->relu->BN->maxpool2 and the permute(0,2,1,3) flatten."""

    def __init__(self, model="full"):
        super().__init__()
        if model == "full":
            in_ch = [1, 1024, 128, 128, 128, 256]
            out_ch = [1024, 128, 128, 128, 256, 512]
            self.in_features = 2048
        else:
            in_ch = [1, 128, 16, 16, 16, 32]
            out_ch = [128, 16, 16, 16, 32, 64]
            self.in_features = 256
        ks = [(512, 1)] + [(64, 1)] * 5
        st = [(4, 1)] + [(1, 1)] * 5
        for i in range(6):
            setattr(self, f"conv{i+1}",
                    torch.nn.Conv2d(in_ch[i], out_ch[i], ks[i], st[i]))
            setattr(self, f"conv{i+1}_BN", torch.nn.BatchNorm2d(out_ch[i]))
        self.classifier = torch.nn.Linear(self.in_features, 360)

    def forward(self, x):
        x = x[:, None, :, None]
        for i in range(6):
            pad = (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32)
            x = torch.nn.functional.pad(x, pad)
            x = getattr(self, f"conv{i+1}")(x)
            x = torch.nn.functional.relu(x)
            x = getattr(self, f"conv{i+1}_BN")(x)
            x = torch.nn.functional.max_pool2d(x, (2, 1), (2, 1))
        x = x.permute(0, 2, 1, 3).reshape(-1, self.in_features)
        return torch.sigmoid(self.classifier(x))


@pytest.mark.parametrize("cap", ["full", "tiny"])
def test_crepe_state_manifest_and_parity(cap, tmp_path):
    """The converter must consume EXACTLY the published torchcrepe state
    layout (vendored manifest fixture) and reproduce the forward pass."""
    import json

    from rvc_tpu.predictors.crepe import CREPE

    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "crepe_state_manifest.json")) as f:
        manifest = json.load(f)[cap]

    torch.manual_seed(0)
    tm = _TorchCrepe(cap)
    # non-trivial running stats so a mean/var mapping slip is caught
    with torch.no_grad():
        for i in range(6):
            bn = getattr(tm, f"conv{i+1}_BN")
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
    tm.eval()

    sd = tm.state_dict()
    assert {k: list(v.shape) for k, v in sd.items()} == manifest

    pt = str(tmp_path / f"crepe_{cap}.pt")
    torch.save(sd, pt)
    ours = CREPE.from_torch_checkpoint(pt, capacity=cap)
    assert ours.model.capacity == cap

    rng = np.random.default_rng(11)
    frames = rng.normal(size=(4, 1024)).astype(np.float32)
    frames = (frames - frames.mean(axis=1, keepdims=True)) / (
        frames.std(axis=1, keepdims=True) + 1e-8
    )
    with torch.no_grad():
        sal_ref = tm(torch.from_numpy(frames)).numpy()
    sal_our = np.asarray(ours.model.apply(
        {"params": ours.params, "batch_stats": ours.batch_stats},
        jnp.asarray(frames),
    ))
    err = np.abs(sal_ref - sal_our).max()
    assert err < 1e-4, f"crepe {cap} parity err {err}"
