"""Shape/structure tests for the optional discriminator zoo (parity targets
cited in rvc_tpu/models/custom_discriminators.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.custom_discriminators import (
    CombinedDiscriminator,
    DiscriminatorR,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
    MultiScaleSTFTDiscriminator,
    build_discriminator,
    cqt_kernels,
)

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini

T = 4096


def _wave(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(1, T, 1)) * 0.1, jnp.float32)


def _check_output(out, n_discs):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = out
    assert len(y_d_rs) == len(y_d_gs) == n_discs
    assert len(fmap_rs) == len(fmap_gs) == n_discs
    for r, g in zip(y_d_rs, y_d_gs):
        assert r.shape == g.shape and r.ndim == 2
        assert np.isfinite(np.asarray(r)).all()
    for fr in fmap_rs:
        assert len(fr) >= 4


def test_discriminator_r_single():
    d = DiscriminatorR(512, 128, 512)
    vs = d.init(jax.random.PRNGKey(0), _wave())
    logits, fmap = d.apply(vs, _wave())
    assert logits.ndim == 2 and len(fmap) == 6


@pytest.mark.slow
def test_mrd():
    d = MultiResolutionDiscriminator(resolutions=((512, 128, 512), (256, 64, 256)))
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    _check_output(d.apply(vs, _wave(), _wave(1)), 2)


@pytest.mark.slow
def test_msstft():
    d = MultiScaleSTFTDiscriminator(n_ffts=(256, 128), hops=(64, 32))
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    _check_output(d.apply(vs, _wave(), _wave(1)), 2)


@pytest.mark.slow
def test_msd():
    d = MultiScaleDiscriminator()
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    _check_output(d.apply(vs, _wave(), _wave(1)), 3)


def test_msstft_reference_structure():
    """EnCodec contract (msstftd.py:35-158): constant trunk width
    (filters_scale=1), plain biased conv_pre (no weight norm), 5 fmap
    entries (conv_post excluded), weight-normed dilated convs."""
    d = MultiScaleSTFTDiscriminator(n_ffts=(256,), hops=(64,), filters=16)
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    p = vs["params"]["disc_stft256"]
    assert "g" not in p["conv_pre"] and "bias" in p["conv_pre"]
    for i in range(3):
        assert "g" in p[f"conv_dil{i}"]
        assert p[f"conv_dil{i}"]["kernel"].shape[-1] == 16  # constant width
    assert p["conv_mid"]["kernel"].shape[-1] == 16
    _, _, fmap_rs, _ = d.apply(vs, _wave(), _wave(1))
    assert len(fmap_rs[0]) == 5  # pre + 3 dilated + mid; post excluded


def test_msd_fregan_dwt_structure():
    """ResWiseMultiScaleDiscriminator (fregan_mpd.py:190-278): shared 1x1
    DWT projections at the wrapper, per-scale DWT side branches, spectral
    norm on the first scale (no weight-norm g param)."""
    d = MultiScaleDiscriminator()
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    p = vs["params"]
    assert p["dwt_conv1"]["kernel"].shape == (1, 2, 1)
    assert p["dwt_conv2"]["kernel"].shape == (1, 4, 1)
    assert "g" not in p["disc_s0"]["conv_0"]  # spectral norm: no g
    assert "g" in p["disc_s1"]["conv_0"]      # weight norm
    assert p["disc_s0"]["dwt_conv1"]["kernel"].shape == (15, 2, 128)
    assert p["disc_s0"]["dwt_conv2"]["kernel"].shape == (41, 4, 128)


def test_spectral_normalize_sigma():
    """After normalization the largest singular value must be ~1."""
    from rvc_tpu.models.custom_discriminators import _spectral_normalize

    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(size=(5, 8, 16)) * 2.0, jnp.float32)
    kn = np.asarray(_spectral_normalize(k, n_iters=30))
    sigma = np.linalg.svd(kn.reshape(-1, 16), compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-3, sigma


def test_mpd_use_spectral_norm():
    """config.use_spectral_norm selects spectral_norm for every MPD conv
    (reference discriminators.py:23-29, 58-61) — no weight-norm g params."""
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator

    d = MultiPeriodDiscriminator(periods=(2,), use_spectral_norm=True)
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))

    def no_g(tree):
        for k, v in tree.items():
            assert k != "g"
            if isinstance(v, dict):
                no_g(v)

    no_g(vs["params"])
    out = d.apply(vs, _wave(), _wave(1))
    _check_output(out, 2)


def test_multirate_cqt_tone_peak():
    """The multirate CQT front must localize a pure tone to its bin, with
    consistent frame counts across the octave/downsample chain."""
    from rvc_tpu.models.custom_discriminators import multirate_cqt

    sr2, hop, n_oct, bpo = 32000, 512, 9, 12
    f_tone, fmin = 440.0, 32.70319566257483
    t = np.arange(sr2) / sr2
    tone = jnp.asarray(0.5 * np.sin(2 * np.pi * f_tone * t),
                       jnp.float32)[None]
    z = np.asarray(multirate_cqt(tone, sr2, hop, n_oct, bpo, fmin))
    assert z.shape == (1, sr2 // hop + 1, n_oct * bpo, 2)
    mag = np.sqrt(z[0, :, :, 0] ** 2 + z[0, :, :, 1] ** 2)
    mid = mag[mag.shape[0] // 2]
    expected_bin = round(np.log2(f_tone / fmin) * bpo)
    assert abs(int(np.argmax(mid)) - expected_bin) <= 1, (
        int(np.argmax(mid)), expected_bin)


@pytest.mark.slow
def test_cqt_discriminator_reference_structure():
    """mssbcqtd contract (mssbcqtd.py:27-183): per-octave plain pre-convs,
    constant 64-ch weight-normed dilated trunk, fmap of 5 (post excluded)."""
    from rvc_tpu.models.custom_discriminators import DiscriminatorCQT

    d = DiscriminatorCQT(16000, hop=512, n_octaves=5, bins_per_octave=12,
                         filters=16)
    w = _wave()
    vs = d.init(jax.random.PRNGKey(0), w)
    p = vs["params"]
    for i in range(5):
        assert "g" not in p[f"conv_pre_oct{i}"]  # plain biased conv
        assert p[f"conv_pre_oct{i}"]["kernel"].shape == (3, 9, 2, 2)
    assert "g" not in p["conv_in"]
    for i in range(3):
        assert "g" in p[f"conv_dil{i}"]
        assert p[f"conv_dil{i}"]["kernel"].shape[-1] == 16
    logits, fmap = d.apply(vs, w)
    assert len(fmap) == 5 and logits.ndim == 2
    assert np.isfinite(np.asarray(logits)).all()


def test_cqt_kernels_shapes():
    cos_k, sin_k, klen = cqt_kernels(16000, 32.7, 48, 12)
    assert cos_k.shape == sin_k.shape == (48, klen)
    assert klen & (klen - 1) == 0  # power of two
    # kernels are normalized and finite
    assert np.isfinite(cos_k).all() and np.abs(cos_k).max() < 1.0


@pytest.mark.slow
def test_combined_discriminator():
    d = CombinedDiscriminator((
        MultiResolutionDiscriminator(resolutions=((256, 64, 256),)),
        MultiScaleSTFTDiscriminator(n_ffts=(128,), hops=(32,)),
    ))
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    out = d.apply(vs, _wave(), _wave(1))
    assert len(out[0]) == 2  # 1 + 1 sub-discriminators


def test_build_discriminator_registry():
    d = build_discriminator(["mrd"])
    assert isinstance(d, MultiResolutionDiscriminator)
    with pytest.raises(ValueError):
        build_discriminator(["nope"])


@pytest.mark.slow
def test_fregan_reswise_mpd():
    from rvc_tpu.models.custom_discriminators import (
        ResWiseMultiPeriodDiscriminator,
    )

    d = ResWiseMultiPeriodDiscriminator(periods=(2, 3))
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    _check_output(d.apply(vs, _wave(), _wave(1)), 2)


@pytest.mark.slow
def test_mmsd():
    from rvc_tpu.models.custom_discriminators import MultiMelScaleDiscriminator

    d = MultiMelScaleDiscriminator(periods=(2,), fft_sizes=(512,))
    vs = d.init(jax.random.PRNGKey(0), _wave(), _wave(1))
    _check_output(d.apply(vs, _wave(), _wave(1)), 2)


def test_haar_dwt_perfect_reconstruction():
    from rvc_tpu.models.custom_discriminators import _haar_dwt

    x = _wave()
    hi, lo = _haar_dwt(x)
    assert hi.shape == lo.shape == (1, T // 2, 1)
    inv_sqrt2 = 0.7071067811865476
    even = (lo + hi) * inv_sqrt2
    odd = (lo - hi) * inv_sqrt2
    np.testing.assert_allclose(np.asarray(even)[0, :, 0],
                               np.asarray(x)[0, 0::2, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(odd)[0, :, 0],
                               np.asarray(x)[0, 1::2, 0], atol=1e-6)


def test_registry_has_all_reference_discriminators():
    from rvc_tpu.models.custom_discriminators import DISCRIMINATOR_REGISTRY

    assert {"mpd_v1", "mrd", "msstft", "mssbcqt", "msd",
            "fregan_mpd", "mmsd"} <= set(DISCRIMINATOR_REGISTRY)


def test_doubled_batch_halves_are_independent():
    """Real and fake ride through each sub-discriminator as one concatenated
    batch (models/discriminators.py, custom_discriminators._run_discs). The
    split must be exact: swapping the (real, fake) argument order must swap
    the (real, fake) outputs, which fails if any op couples the two halves
    (e.g. a batch-coupled norm) or the slice offsets are wrong. Tolerances
    are fp-reassociation-level: XLA may accumulate convs in a
    batch-position-dependent order (~2e-8 rel observed on CPU at highest
    matmul precision), which is not half-coupling."""
    from rvc_tpu.models.discriminators import MultiPeriodDiscriminator

    y, z = _wave(1), _wave(2)
    for d in (MultiPeriodDiscriminator(periods=(2, 3)),
              MultiScaleDiscriminator(),
              MultiResolutionDiscriminator(resolutions=((512, 128, 512),))):
        vs = d.init(jax.random.PRNGKey(0), y, z)
        r1, g1, fr1, fg1 = d.apply(vs, y, z)
        r2, g2, fr2, fg2 = d.apply(vs, z, y)
        for a, b in zip(r1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7)
        for a, b in zip(g1, r2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7)
        for fa, fb in zip(fr1, fg2):
            for a, b in zip(fa, fb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-6, atol=1e-7)
