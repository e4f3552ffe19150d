"""GAN training losses as pure JAX functions.

Parity targets: rvc/train/losses.py (LSGAN d/g losses, WGAN variants,
feature-matching, silence-masked FM, KL) and the multi-scale mel loss of
rvc/train/mel_processing.py:156-234. All functions take/return f32 arrays and
are jit/grad-safe; fp32 is forced at the loss boundary (the reference computes
losses in fp32 outside the autocast region, train.py:1094-1154).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.stft import multiscale_mel_window, stft_magnitude
from ..ops.mel import mel_filterbank

Fmaps = List[List[jax.Array]]


def discriminator_loss(
    real_outputs: Sequence[jax.Array], fake_outputs: Sequence[jax.Array]
) -> jax.Array:
    """LSGAN discriminator loss summed over sub-discriminators
    (reference losses.py:49-68)."""
    loss = 0.0
    for dr, dg in zip(real_outputs, fake_outputs):
        loss += jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        loss += jnp.mean(dg.astype(jnp.float32) ** 2)
    return loss


def generator_loss(fake_outputs: Sequence[jax.Array]) -> jax.Array:
    """LSGAN generator loss (reference losses.py:70-81)."""
    loss = 0.0
    for dg in fake_outputs:
        loss += jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss


def wgan_discriminator_loss(
    real_outputs: Sequence[jax.Array], fake_outputs: Sequence[jax.Array]
) -> jax.Array:
    """WGAN critic loss (reference losses.py:84-85)."""
    return sum(
        jnp.mean(dg.astype(jnp.float32)) - jnp.mean(dr.astype(jnp.float32))
        for dg, dr in zip(fake_outputs, real_outputs)
    )


def wgan_generator_loss(fake_outputs: Sequence[jax.Array]) -> jax.Array:
    """WGAN generator loss (reference losses.py:88-101)."""
    return sum(-jnp.mean(dg.astype(jnp.float32)) for dg in fake_outputs)


def feature_loss(fmap_r: Fmaps, fmap_g: Fmaps) -> jax.Array:
    """L1 feature-matching over all layers of all sub-discriminators
    (reference losses.py:3-15). NOTE: the ×2 weight is applied by the caller,
    matching train.py:1100."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss


def feature_loss_masked(
    fmap_r: Fmaps, fmap_g: Fmaps, silence_mask: Optional[jax.Array] = None
) -> jax.Array:
    """Silence-aware feature matching (reference losses.py:17-47): per-sample
    layer-mean L1, scaled by a [B] voiced mask, normalized by mask sum."""
    per_layer = []
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            diff = jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32))
            per_layer.append(diff.reshape(diff.shape[0], -1).mean(axis=1))
    total = jnp.stack(per_layer, axis=0).mean(axis=0)  # [B]
    if silence_mask is not None:
        total = total * silence_mask
        return total.sum() / (silence_mask.sum() + 1e-6)
    return total.mean()


def kl_loss(
    z_p: jax.Array,
    logs_q: jax.Array,
    m_p: jax.Array,
    logs_p: jax.Array,
    z_mask: jax.Array,
) -> jax.Array:
    """KL between posterior sample and prior (reference losses.py:104-120).
    All tensors [B, T, C]; z_mask [B, T, 1]."""
    z_p = z_p.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    # z_mask broadcasts over channels in the numerator but is counted once
    # per (batch, frame) in the denominator, exactly as the reference's
    # [B, 1, T] mask does against [B, C, T] tensors.
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)


def gradient_penalty(
    rng: jax.Array,
    disc_apply,
    disc_params,
    real: jax.Array,
    fake: jax.Array,
) -> jax.Array:
    """WGAN-GP penalty (reference losses.py:122-144): unit-gradient constraint
    on interpolates, critic score averaged over all sub-discriminator outputs."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1), real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def critic(x):
        # disc_apply(real, fake) runs ONE doubled batch internally
        # (discriminators.run_discriminators), so feed half the interpolates
        # down each branch: total batch stays B instead of the 2B a naive
        # disc_apply(x, x) would cost.
        b = x.shape[0]
        if b % 2 == 0:
            outs_r, outs_g, _, _ = disc_apply(
                disc_params, x[: b // 2], x[b // 2 :]
            )
            per = [
                jnp.concatenate(
                    [r.reshape(r.shape[0], -1).mean(axis=1),
                     g.reshape(g.shape[0], -1).mean(axis=1)]
                )
                for r, g in zip(outs_r, outs_g)
            ]
        else:
            outs, _, _, _ = disc_apply(disc_params, x, x)
            per = [o.reshape(o.shape[0], -1).mean(axis=1) for o in outs]
        return jnp.stack(per).mean()

    grads = jax.grad(critic)(interp)
    grads = grads.reshape(grads.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(grads**2, axis=1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)


# ---------------------------------------------------------------------------
# Spectral losses
# ---------------------------------------------------------------------------

MULTISCALE_N_MELS = (5, 10, 20, 40, 80, 160, 320, 480)


def _log10_mel(
    wav: jax.Array, sample_rate: int, n_mels: int, window: int, hop: int
) -> jax.Array:
    """Centered-STFT log10 mel as used by the multi-scale loss
    (mel_processing.py:180-220)."""
    mag = stft_magnitude(wav, window, hop, window, center=True)
    fb = jnp.asarray(mel_filterbank(sample_rate, window, n_mels, 0.0, None).T)
    mel = jnp.matmul(mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5)) / jnp.log(10.0)


def multiscale_mel_loss(
    real: jax.Array,
    fake: jax.Array,
    sample_rate: int,
    n_mels: Sequence[int] = MULTISCALE_N_MELS,
) -> jax.Array:
    """Sum of L1 log10-mel distances over 8 resolutions
    (mel_processing.py:156-234). real/fake: [B, T] waveforms; hop = sr/100."""
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    hop = sample_rate // 100
    loss = 0.0
    for m in n_mels:
        window = multiscale_mel_window(m, sample_rate)
        loss += jnp.mean(
            jnp.abs(
                _log10_mel(real, sample_rate, m, window, hop)
                - _log10_mel(fake, sample_rate, m, window, hop)
            )
        )
    return loss


def mel_l1_loss(mel_real: jax.Array, mel_fake: jax.Array) -> jax.Array:
    """Plain L1 on precomputed log-mels (train.py:1104-1106 single-scale path)."""
    return jnp.mean(jnp.abs(mel_real.astype(jnp.float32) - mel_fake.astype(jnp.float32)))


def multi_resolution_stft_loss(
    real: jax.Array,
    fake: jax.Array,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
) -> jax.Array:
    """auraloss-style MultiResolutionSTFTLoss (validation metric,
    train.py:1489): spectral-convergence + log-magnitude L1 averaged over
    resolutions."""
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        mr = stft_magnitude(real, n_fft, hop, win, center=True)
        mf = stft_magnitude(fake, n_fft, hop, win, center=True)
        sc = jnp.linalg.norm(mr - mf) / (jnp.linalg.norm(mr) + 1e-8)
        mag = jnp.mean(jnp.abs(jnp.log(mr + 1e-7) - jnp.log(mf + 1e-7)))
        total += sc + mag
    return total / len(fft_sizes)


def si_sdr(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SDR in dB, batch-meaned (reference train.py:244-257)."""
    est = est.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True) + eps) * ref / (
        jnp.sum(ref**2, axis=-1, keepdims=True) + eps
    )
    noise = est - proj
    ratio = (jnp.sum(proj**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    return jnp.mean(10.0 * jnp.log10(ratio))


def mel_similarity_percent(mel_real: jax.Array, mel_fake: jax.Array) -> jax.Array:
    """Train-time mel-spectrogram similarity %, clamped to [0, 100]
    (reference train.py:184-204: 100 - L1 * 100)."""
    t = min(mel_real.shape[1], mel_fake.shape[1])
    diff = jnp.abs(mel_real[:, :t] - mel_fake[:, :t]).mean()
    return jnp.clip(100.0 - diff * 100.0, 0.0, 100.0)
