"""STFT/mel numerics vs. torch oracle (same math as the reference pipeline)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rvc_tpu.ops import mel_filterbank, spectrogram, spec_to_mel, stft_magnitude
from rvc_tpu.ops.stft import _hann_window, frame_signal, multiscale_mel_window


def torch_spectrogram(y, n_fft, hop, win):
    """Oracle replicating reference spectrogram_torch numerics w/ torch.stft."""
    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt[:, None], (pad, pad), mode="reflect")[:, 0]
    spec = torch.stft(
        yt,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        return_complex=True,
    )
    return torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6).numpy()


def test_hann_window_matches_torch():
    for n in (64, 400, 2048):
        np.testing.assert_allclose(
            _hann_window(n), torch.hann_window(n).numpy(), atol=1e-6
        )


def test_frame_signal_shape_and_values():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 1000)).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(y), 256, 100))
    assert frames.shape == (2, 8, 256)
    np.testing.assert_allclose(frames[0, 3], y[0, 300:556], atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(1024, 320), (2048, 480)])
def test_spectrogram_matches_torch(n_fft, hop):
    rng = np.random.default_rng(1)
    t = hop * 20
    y = rng.standard_normal((2, t)).astype(np.float32) * 0.3
    ours = np.asarray(spectrogram(jnp.asarray(y), n_fft, hop, n_fft))
    ref = torch_spectrogram(y, n_fft, hop, n_fft)  # [B, bins, frames]
    assert ours.shape == (2, t // hop, n_fft // 2 + 1)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=2e-3, atol=2e-4)


def test_centered_stft_matches_torch():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((1, 4096)).astype(np.float32)
    n_fft, hop = 512, 128
    ours = np.asarray(
        stft_magnitude(jnp.asarray(y), n_fft, hop, n_fft, center=True)
    )
    spec = torch.stft(
        torch.from_numpy(y),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
    )
    ref = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=2e-3, atol=2e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(48000, 2048, 128)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # htk variant differs from slaney
    fb_htk = mel_filterbank(16000, 1024, 128, fmin=30, fmax=8000, htk=True, norm=None)
    assert fb_htk.shape == (128, 513)
    assert not np.allclose(fb[:, :513], fb_htk)


def test_mel_filterbank_matches_torchaudio_if_available():
    torchaudio = pytest.importorskip("torchaudio")
    if getattr(torchaudio, "__rvc_tpu_stub__", False):
        pytest.skip("torchaudio is the parity-test stub, not the real wheel")
    fb_ref = torchaudio.functional.melscale_fbanks(
        n_freqs=1025,
        f_min=0.0,
        f_max=24000.0,
        n_mels=128,
        sample_rate=48000,
        norm="slaney",
        mel_scale="slaney",
    ).numpy().T
    fb = mel_filterbank(48000, 2048, 128)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-5)


def test_spec_to_mel_log_clamp():
    spec = jnp.zeros((1, 4, 1025))
    mel = np.asarray(spec_to_mel(spec, 2048, 128, 48000))
    assert np.all(np.isfinite(mel))
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-5)


def test_multiscale_windows():
    # reference compute_window_length values at 48k
    assert multiscale_mel_window(5, 48000) == 64
    assert multiscale_mel_window(80, 48000) == 1024
    assert multiscale_mel_window(480, 48000) == 4096


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/logs/mute"),
    reason="reference fixtures not mounted",
)
def test_reference_mute_spec_artifact_parity():
    """Real-artifact parity: the reference ships precomputed .spec.pt files
    for its mute training rows (logs/mute/sliced_audios, produced by
    mel_processing.spectrogram_torch at training time). Our spectrogram of
    the same wav must reproduce them.

    Silence is a degenerate but exact probe: every bin must equal
    sqrt(eps) = 1e-3, and the frame count must match the reference's
    centered-frame arithmetic bit for bit."""
    torch = pytest.importorskip("torch")
    from scipy.io import wavfile

    from rvc_tpu.configs import get_config

    cases = [  # (wav/spec paths, n_fft, hop, win)
        ("mute/sliced_audios/mute48000", None, 48000),
        ("mute_spin/sliced_audios/mute40000", None, 40000),
        # 44.1k has no config preset; the artifact was made with hop 441
        ("mute/sliced_audios/mute44100", (2048, 441, 2048), None),
    ]
    for stem, params, sr in cases:
        ref = torch.load(
            f"/root/reference/logs/{stem}.spec.pt", weights_only=True
        ).numpy()  # [bins, frames]
        _, wav = wavfile.read(f"/root/reference/logs/{stem}.wav")
        audio = (wav.astype(np.float32) / 32768.0)[None]
        if params is None:
            cfg = get_config(sr)
            params = (cfg.data.filter_length, cfg.data.hop_length,
                      cfg.data.win_length)
        ours = np.asarray(
            spectrogram(jnp.asarray(audio), *params)
        )[0]  # [frames, bins]
        assert ours.shape == (ref.shape[1], ref.shape[0]), (stem, ours.shape, ref.shape)
        np.testing.assert_allclose(ours.T, ref, rtol=0, atol=1e-7)
