"""Behavioral tests for training losses (parity targets cited per-function
in rvc_tpu/train/losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.train import losses as L

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


def test_lsgan_discriminator_loss_perfect():
    real = [jnp.ones((2, 5))]
    fake = [jnp.zeros((2, 5))]
    assert float(L.discriminator_loss(real, fake)) == pytest.approx(0.0)


def test_lsgan_generator_loss_perfect():
    fake = [jnp.ones((2, 5))]
    assert float(L.generator_loss(fake)) == pytest.approx(0.0)


def test_lsgan_losses_sum_over_discriminators():
    real = [jnp.zeros((1, 4)), jnp.zeros((1, 4))]
    fake = [jnp.zeros((1, 4)), jnp.zeros((1, 4))]
    # each: (1-0)^2 + 0^2 = 1
    assert float(L.discriminator_loss(real, fake)) == pytest.approx(2.0)
    assert float(L.generator_loss(fake)) == pytest.approx(2.0)


def test_wgan_losses():
    real = [jnp.full((2, 3), 2.0)]
    fake = [jnp.full((2, 3), 0.5)]
    assert float(L.wgan_discriminator_loss(real, fake)) == pytest.approx(-1.5)
    assert float(L.wgan_generator_loss(fake)) == pytest.approx(-0.5)


def test_feature_loss_zero_for_identical():
    fmaps = [[jnp.ones((1, 4, 2)), jnp.ones((1, 3, 2))]]
    assert float(L.feature_loss(fmaps, fmaps)) == pytest.approx(0.0)


def test_feature_loss_l1_scaling():
    a = [[jnp.zeros((1, 4))]]
    b = [[jnp.full((1, 4), 3.0)]]
    assert float(L.feature_loss(a, b)) == pytest.approx(3.0)


def test_feature_loss_masked_matches_unmasked_for_uniform_mask():
    rng = np.random.default_rng(0)
    fa = [[jnp.asarray(rng.normal(size=(2, 4)), dtype=jnp.float32)]]
    fb = [[jnp.asarray(rng.normal(size=(2, 4)), dtype=jnp.float32)]]
    unmasked = float(L.feature_loss_masked(fa, fb))
    uniform = float(L.feature_loss_masked(fa, fb, jnp.ones((2,))))
    assert unmasked == pytest.approx(uniform, rel=1e-5)


def test_kl_loss_analytic_value():
    # Sample-based estimator: z_p == m_p, matched logs -> -0.5 per element,
    # normalized per frame (x channels).
    b, t, c = 2, 6, 4
    m = jnp.asarray(np.random.default_rng(1).normal(size=(b, t, c)), jnp.float32)
    logs = jnp.zeros((b, t, c))
    mask = jnp.ones((b, t, 1))
    val = float(L.kl_loss(m, logs, m, logs, mask))
    assert val == pytest.approx(-0.5 * c, abs=1e-6)


def test_kl_loss_expectation_zero_for_matching_distributions():
    # Averaged over samples z_p ~ N(m_p, exp(logs_p)), the estimator's mean
    # tends to 0 when posterior == prior.
    b, t, c = 4, 50, 16
    rng = np.random.default_rng(11)
    m = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    logs = jnp.zeros((b, t, c))
    z_p = m + jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    mask = jnp.ones((b, t, 1))
    val = float(L.kl_loss(z_p, logs, m, logs, mask))
    assert abs(val) < 0.5  # scaled by c=16; mean ~0 with sampling noise


def test_kl_loss_mask_normalization():
    """Numerator broadcasts over channels, denominator counts frames once —
    the reference's [B,1,T] mask semantics."""
    b, t, c = 1, 4, 8
    z_p = jnp.full((b, t, c), 2.0)
    m_p = jnp.zeros((b, t, c))
    logs = jnp.zeros((b, t, c))
    mask = jnp.ones((b, t, 1))
    # per-element kl = -0.5 + 0.5 * 2^2 = 1.5; denom counts frames once -> 1.5*c
    val = float(L.kl_loss(z_p, logs, m_p, logs, mask))
    assert val == pytest.approx(1.5 * c, rel=1e-6)


def test_si_sdr_perfect_reconstruction_is_large():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 1000)), jnp.float32)
    assert float(L.si_sdr(x, x)) > 60.0


def test_si_sdr_scale_invariance():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 500)), jnp.float32)
    assert float(L.si_sdr(2.5 * x, x)) > 60.0


def test_multiscale_mel_loss_zero_for_identical():
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 4800)) * 0.1, jnp.float32
    )
    assert float(L.multiscale_mel_loss(x, x, 48000)) == pytest.approx(0.0, abs=1e-5)


def test_multiscale_mel_loss_positive_for_different():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(1, 4800)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 4800)) * 0.1, jnp.float32)
    assert float(L.multiscale_mel_loss(a, b, 48000)) > 0.1


def test_multi_resolution_stft_loss():
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.normal(size=(1, 4000)) * 0.1, jnp.float32)
    assert float(L.multi_resolution_stft_loss(a, a)) == pytest.approx(0.0, abs=1e-4)
    b = jnp.asarray(rng.normal(size=(1, 4000)) * 0.1, jnp.float32)
    assert float(L.multi_resolution_stft_loss(a, b)) > 0.1


def test_mel_similarity_range():
    a = jnp.zeros((1, 10, 4))
    assert float(L.mel_similarity_percent(a, a)) == pytest.approx(100.0)
    b = jnp.full((1, 10, 4), 10.0)
    assert float(L.mel_similarity_percent(a, b)) == pytest.approx(0.0)


def test_gradient_penalty_unit_gradient():
    """A critic x -> mean(x) has tiny gradients, so GP ~ (|g|-1)^2 ~ 1."""

    def disc_apply(params, y, y_hat):
        del params
        return ([y.reshape(y.shape[0], -1)],
                [y_hat.reshape(y_hat.shape[0], -1)], None, None)

    real = jnp.asarray(np.random.default_rng(7).normal(size=(2, 64, 1)), jnp.float32)
    fake = jnp.asarray(np.random.default_rng(8).normal(size=(2, 64, 1)), jnp.float32)
    gp = float(
        L.gradient_penalty(jax.random.PRNGKey(0), disc_apply, None, real, fake)
    )
    assert np.isfinite(gp) and gp > 0.5
