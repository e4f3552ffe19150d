"""F0 predictor tests: YIN accuracy on synthetic tones, RMVPE/FCPE/CREPE
shape + decode contracts with random weights (no pretrained assets in this
environment; numerics vs torch are covered by the converter design and
decode unit tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rvc_tpu.predictors.dsp_f0 import yin_f0_np

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def _tone(freq, seconds=1.0, sr=16000, amp=0.4):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_yin_pure_tone_220():
    f0 = yin_f0_np(_tone(220.0))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert np.median(voiced) == pytest.approx(220.0, rel=0.02)


def test_yin_tone_440_and_octave_immunity():
    f0 = yin_f0_np(_tone(440.0))
    voiced = f0[f0 > 0]
    assert np.median(voiced) == pytest.approx(440.0, rel=0.02)


def test_yin_silence_is_unvoiced():
    f0 = yin_f0_np(np.zeros(16000, np.float32))
    assert np.all(f0 == 0)


def test_yin_frame_count():
    audio = _tone(100.0, seconds=0.5)
    f0 = yin_f0_np(audio)
    assert len(f0) == len(audio) // 160 + 1


def test_rmvpe_decode_salience():
    from rvc_tpu.predictors.rmvpe import CENTS_MAPPING, decode_salience

    t, n = 5, 360
    sal = np.full((t, n), 0.01, np.float32)
    target_bin = 180
    sal[:, target_bin] = 0.9
    f0 = np.asarray(decode_salience(jnp.asarray(sal), thred=0.03))
    expected = 10 * 2 ** (CENTS_MAPPING[target_bin] / 1200)
    assert f0[0] == pytest.approx(expected, rel=0.02)
    # below threshold -> 0
    low = np.full((t, n), 0.001, np.float32)
    f0_low = np.asarray(decode_salience(jnp.asarray(low), thred=0.03))
    assert np.all(f0_low == 0)


def test_fcpe_decode_latent():
    from rvc_tpu.predictors.fcpe import CENT_TABLE, decode_latent

    t, n = 4, 360
    latent = np.full((t, n), 0.01, np.float32)
    latent[:, 100] = 0.8
    f0 = np.asarray(decode_latent(jnp.asarray(latent)))
    expected = 10 * 2 ** (CENT_TABLE[100] / 1200)
    assert f0[0] == pytest.approx(expected, rel=0.05)
    quiet = np.full((t, n), 0.01, np.float32)
    assert np.all(np.asarray(decode_latent(jnp.asarray(quiet))) == 0)


def test_crepe_decoders():
    from rvc_tpu.predictors.crepe import (
        CENTS_MAPPING, _decode_viterbi, _decode_weighted,
    )

    t = 6
    sal = np.full((t, 360), 0.01, np.float32)
    sal[:, 200] = 0.9
    for decode in (_decode_weighted, _decode_viterbi):
        cents = decode(sal)
        assert cents[2] == pytest.approx(CENTS_MAPPING[200], rel=0.01)


@pytest.mark.slow
def test_rmvpe_random_weights_shape():
    from rvc_tpu.predictors.rmvpe import RMVPE

    mdl = RMVPE()
    audio = _tone(220.0, seconds=0.4)
    f0 = mdl.infer_from_audio(audio)
    assert f0.shape == (len(audio) // 160 + 1,)
    assert np.isfinite(f0).all()


@pytest.mark.slow
def test_fcpe_random_weights_shape():
    from rvc_tpu.predictors.fcpe import FCPE

    mdl = FCPE()
    audio = _tone(220.0, seconds=0.4)
    f0 = mdl.compute_f0(audio, p_len=50)
    assert f0.shape == (50,)
    assert np.isfinite(f0).all()


@pytest.mark.slow
def test_crepe_random_weights_shape():
    from rvc_tpu.predictors.crepe import CREPE

    mdl = CREPE("tiny")
    audio = _tone(220.0, seconds=0.3)
    f0 = mdl.predict(audio, decoder="weighted")
    assert f0.shape == (len(audio) // 160 + 1,)
    assert np.isfinite(f0).all()


def test_converter_builds_predictor_registry():
    """CLI default --f0_method rmvpe must resolve to a real predictor even
    without downloaded checkpoints (random-init fallback)."""
    from rvc_tpu.infer.converter import VoiceConverter

    vc = VoiceConverter()
    p = vc.get_predictors("rmvpe")
    assert "rmvpe" in p and callable(p["rmvpe"])
    # cached on second call
    assert vc.get_predictors("rmvpe")["rmvpe"] is p["rmvpe"]
    # hybrid spawns both
    p2 = vc.get_predictors("hybrid[rmvpe+fcpe]")
    assert "fcpe" in p2


def test_rmvpe_bf16_salience_close_to_f32():
    """bf16 serving path (pipeline precision="bf16" casts RMVPE params and
    mel): salience must stay close to the f32 forward. The reference runs
    RMVPE at fp16 on GPU (RMVPE.py is_half), so reduced precision here is
    parity behavior, not a shortcut."""
    import jax
    from rvc_tpu.predictors.rmvpe import E2EModel

    model = E2EModel()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, 32, 128)) * 2.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel)
    h32 = np.asarray(model.apply(variables, mel))
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    h16 = np.asarray(model.apply(
        cast(variables), mel.astype(jnp.bfloat16)).astype(jnp.float32))
    # sigmoid outputs in [0,1]; bf16 keeps ~2-3 decimal digits
    assert np.abs(h16 - h32).mean() < 0.01
    assert np.abs(h16 - h32).max() < 0.08


def test_rmvpe_convt2x2_mm_matches_lax_conv():
    """The polyphase-matmul ConvTranspose (rmvpe._convt2x2_mm) must equal
    the input-dilated lax.conv formulation it can replace. It defaults OFF
    (chip-probed slight loss, docs/PERFORMANCE.md) but stays covered here
    so the RVC_TPU_RMVPE_CONVT_MM_MIN_CH knob remains usable."""
    import jax
    from rvc_tpu.predictors.rmvpe import _convt2x2_mm

    rng = np.random.default_rng(7)
    for b, h, w, ci, co in ((1, 4, 4, 8, 5), (2, 7, 3, 16, 16)):
        x = jnp.asarray(rng.normal(size=(b, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(k, axis=(0, 1)), window_strides=(1, 1),
            padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _convt2x2_mm(x, k)
        assert got.shape == (b, 2 * h, 2 * w, co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
