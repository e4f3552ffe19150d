"""Model zoo: shapes, determinism, and structural invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models import MultiPeriodDiscriminator, Synthesizer
from rvc_tpu.models.attentions import _abs_to_rel, _rel_to_abs
from rvc_tpu.models.encoders import TextEncoder
from rvc_tpu.models.flows import ResidualCouplingBlock
from rvc_tpu.models.generators.nsf import HiFiGANNSFGenerator
from rvc_tpu.models.generators.sine import SineGenerator

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def small_synth(vocoder="HiFi-GAN"):
    return Synthesizer(
        spec_channels=513,
        segment_size=8,
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=2,
        kernel_size=3,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(10, 8, 2, 2),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(20, 16, 4, 4),
        spk_embed_dim=4,
        gin_channels=16,
        sr=32000,
        use_f0=True,
        text_enc_hidden_dim=96,
        vocoder=vocoder,
    )


def test_rel_abs_roundtrip_shapes():
    x = jnp.ones((2, 2, 7, 13))  # [B,H,L,2L-1]
    out = _rel_to_abs(x)
    assert out.shape == (2, 2, 7, 7)
    back = _abs_to_rel(out)
    assert back.shape == (2, 2, 7, 13)


def test_rel_to_abs_diagonal_semantics():
    """rel index w+j-i maps to abs (i, j): check a delta at rel offset 0."""
    L = 5
    x = np.zeros((1, 1, L, 2 * L - 1), np.float32)
    x[:, :, :, L - 1] = 7.0  # offset 0 -> diagonal
    out = np.asarray(_rel_to_abs(jnp.asarray(x)))
    np.testing.assert_allclose(out[0, 0], np.eye(L) * 7.0)


def test_text_encoder_shapes_and_mask():
    enc = TextEncoder(
        out_channels=16, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=2, kernel_size=3, embedding_dim=96,
    )
    rng = jax.random.PRNGKey(0)
    phone = jnp.ones((2, 12, 96))
    pitch = jnp.zeros((2, 12), jnp.int32)
    lengths = jnp.array([12, 7])
    params = enc.init(rng, phone, pitch, lengths)
    m, logs, mask = enc.apply(params, phone, pitch, lengths)
    assert m.shape == (2, 12, 16) and logs.shape == (2, 12, 16)
    # masked positions are zero
    np.testing.assert_allclose(np.asarray(m[1, 7:]), 0.0, atol=1e-6)


def test_flow_is_invertible():
    flow = ResidualCouplingBlock(channels=8, hidden_channels=16, n_layers=2, n_flows=2, gin_channels=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    mask = jnp.ones((2, 10, 1))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 4))
    params = flow.init(rng, x, mask, g)
    # inject non-zero post convs so the flow actually transforms
    params = jax.tree.map(
        lambda p: p + 0.01 * jnp.ones_like(p) if p.ndim == 3 else p, params
    )
    z = flow.apply(params, x, mask, g, reverse=False)
    x_rec = flow.apply(params, z, mask, g, reverse=True)
    assert not np.allclose(np.asarray(z), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_sine_generator_phase_continuity():
    """Constant f0 must give a pure continuous sine (no frame-boundary jumps)."""
    gen = SineGenerator(sampling_rate=16000, noise_stddev=0.0)
    f0 = jnp.full((1, 20), 100.0)
    upp = 160
    sine, uv, _ = gen.apply(
        {}, f0, upp, rngs={"noise": jax.random.PRNGKey(0)}
    )
    sine = np.asarray(sine)[0, :, 0]
    assert np.all(np.asarray(uv) == 1.0)
    t = (np.arange(1, 20 * upp + 1)) / 16000.0
    expected = 0.1 * np.sin(2 * np.pi * 100.0 * t)
    np.testing.assert_allclose(sine, expected, atol=2e-3)


def test_nsf_generator_output_length():
    gen = HiFiGANNSFGenerator(
        initial_channel=8,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(10, 8, 2, 2),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(20, 16, 4, 4),
        gin_channels=4,
        sr=32000,
    )
    frames = 12
    x = jnp.ones((2, frames, 8))
    f0 = jnp.full((2, frames), 220.0)
    g = jnp.ones((2, 1, 4))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, f0, g)
    o = gen.apply(params, x, f0, g, rngs={"noise": jax.random.PRNGKey(2)})
    assert o.shape == (2, frames * 320, 1)
    assert np.all(np.abs(np.asarray(o)) <= 1.0)


def test_nsf_generator_odd_rates_output_length():
    """48k-style config has even rates; test an odd-rate stack too (e.g. 5)."""
    gen = HiFiGANNSFGenerator(
        initial_channel=4,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),),
        upsample_rates=(5, 4),
        upsample_initial_channel=16,
        upsample_kernel_sizes=(10, 8),
        gin_channels=0,
        sr=16000,
    )
    x = jnp.ones((1, 9, 4))
    f0 = jnp.full((1, 9), 110.0)
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, f0, None)
    o = gen.apply(params, x, f0, None, rngs={"noise": jax.random.PRNGKey(2)})
    assert o.shape == (1, 9 * 20, 1)


def test_synthesizer_train_and_infer():
    model = small_synth()
    b, t_frames = 2, 20
    phone = jnp.ones((b, t_frames, 96)) * 0.1
    phone_lengths = jnp.array([t_frames, 15])
    pitch = jnp.ones((b, t_frames), jnp.int32) * 50
    pitchf = jnp.full((b, t_frames), 200.0)
    spec = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (b, t_frames, 513)))
    spec_lengths = jnp.array([t_frames, 15])
    sid = jnp.array([0, 1])

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = model.init(rngs, phone, phone_lengths, pitch, pitchf, spec, spec_lengths, sid)

    o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = model.apply(
        params, phone, phone_lengths, pitch, pitchf, spec, spec_lengths, sid,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    upp = 10 * 8 * 2 * 2
    assert o.shape == (b, 8 * upp, 1)
    assert z.shape == (b, t_frames, 32)
    assert ids_slice.shape == (b,)

    o_inf, mask = model.apply(
        params, phone, phone_lengths, pitch, pitchf, sid,
        method=Synthesizer.infer, rngs={"noise": jax.random.PRNGKey(3)},
    )
    assert o_inf.shape == (b, t_frames * upp, 1)

    # determinism given same rng
    o_inf2, _ = model.apply(
        params, phone, phone_lengths, pitch, pitchf, sid,
        method=Synthesizer.infer, rngs={"noise": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(np.asarray(o_inf), np.asarray(o_inf2))


def test_synthesizer_from_config_shapes():
    cfg = get_config(48000)
    model = Synthesizer.from_config(cfg)
    assert model.segment_size == 17280 // 480
    assert model.sr == 48000
    assert model.upsample_rates == (12, 10, 2, 2)


def test_multi_period_discriminator():
    mpd = MultiPeriodDiscriminator()
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 2220, 1))
    y_hat = jax.random.normal(jax.random.PRNGKey(1), (1, 2220, 1))
    params = mpd.init(jax.random.PRNGKey(2), y, y_hat)
    outs_r, outs_g, fmap_r, fmap_g = mpd.apply(params, y, y_hat)
    assert len(outs_r) == 9  # 1 scale + 8 periods
    assert len(fmap_r) == 9
    assert len(fmap_r[0]) == 7  # DiscriminatorS: 6 convs + post
    assert all(len(f) == 6 for f in fmap_r[1:])  # DiscriminatorP: 5 convs + post
