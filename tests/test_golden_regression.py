"""Golden-output regression (SURVEY §4 test strategy: the logs/reference
pattern). A fixed-seed tiny synthesizer renders the reference golden inputs
in zero-noise mode; the output fingerprint is stored in tests/golden/ and
asserted on every run — silent numerics drift across refactors fails here.

Regenerate intentionally with: REGEN_GOLDEN=1 pytest tests/test_golden_regression.py
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.configs import get_config
from rvc_tpu.models.synthesizer import Synthesizer

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_synth_out.npz")
REF_DIR = "/root/reference/logs/reference"


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="golden inputs absent")
def test_golden_synth_output_stable():
    cfg = get_config(48000)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            inter_channels=16, hidden_channels=16, filter_channels=32,
            n_heads=2, n_layers=2, upsample_initial_channel=32, gin_channels=16,
            spk_embed_dim=4, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            upsample_rates=(12, 10, 2, 2), upsample_kernel_sizes=(24, 20, 4, 4),
        ),
    )
    model = dataclasses.replace(
        Synthesizer.from_config(cfg), zero_noise=True,
        posterior_layers=2, flow_layers=1,
    )
    T = 64
    feats = np.load(os.path.join(REF_DIR, "ref_feats.npy"))
    f0c = np.load(os.path.join(REF_DIR, "ref_f0c.npy"))
    f0f = np.load(os.path.join(REF_DIR, "ref_f0f.npy"))
    phone = jnp.asarray(np.repeat(feats, 2, axis=0)[None, :T], jnp.float32)
    pitch = jnp.asarray(f0c[None, :T], jnp.int32)
    pitchf = jnp.asarray(f0f[None, :T], jnp.float32)
    lengths = jnp.asarray([T], jnp.int32)
    sid = jnp.zeros((1,), jnp.int32)

    vs = model.init(
        {"params": jax.random.PRNGKey(1234), "noise": jax.random.PRNGKey(0)},
        phone, lengths, pitch, pitchf,
        jnp.zeros((1, T, cfg.data.spec_channels)), lengths, sid,
    )
    audio, _ = model.apply(
        vs, phone, lengths, pitch, pitchf, sid,
        method=type(model).infer, rngs={"noise": jax.random.PRNGKey(0)},
    )
    out = np.asarray(audio[0, :, 0])

    fingerprint = {
        "mean": np.float64(out.mean()),
        "std": np.float64(out.std()),
        "absmax": np.float64(np.abs(out).max()),
        "samples": out[:: len(out) // 64][:64].astype(np.float64),
    }

    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **fingerprint)
        pytest.skip("golden fixture (re)generated")

    ref = np.load(GOLDEN)
    assert fingerprint["std"] == pytest.approx(float(ref["std"]), rel=1e-3)
    assert fingerprint["absmax"] == pytest.approx(float(ref["absmax"]), rel=1e-3)
    np.testing.assert_allclose(
        fingerprint["samples"], ref["samples"], rtol=1e-3, atol=1e-5
    )


def test_golden_fcpe_favor_latent_stable():
    """Fixed-seed FCPE (full Performer conformer) latent fingerprint: locks
    the FAVOR+ numerics (projection init, kernel asymmetry, linear
    attention) against silent drift across refactors."""
    from rvc_tpu.predictors.fcpe import CFNaiveMelPE

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "tiny_fcpe_latent.npz")
    model = CFNaiveMelPE(hidden_dims=64, n_layers=2, n_heads=2,
                         conv_only=False)
    rng = np.random.default_rng(21)
    mel = jnp.asarray(rng.normal(size=(1, 48, 128)), jnp.float32)
    params = model.init(jax.random.PRNGKey(77), mel)["params"]
    lat = np.asarray(model.apply({"params": params}, mel))[0]

    fingerprint = {
        "mean": np.float64(lat.mean()),
        "std": np.float64(lat.std()),
        "row0": lat[0].astype(np.float64),
        "col0": lat[:, 0].astype(np.float64),
    }
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(golden):
        np.savez(golden, **fingerprint)
        pytest.skip("golden fixture (re)generated")
    ref = np.load(golden)
    assert fingerprint["mean"] == pytest.approx(float(ref["mean"]), abs=1e-5)
    assert fingerprint["std"] == pytest.approx(float(ref["std"]), rel=1e-3)
    np.testing.assert_allclose(fingerprint["row0"], ref["row0"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(fingerprint["col0"], ref["col0"],
                               rtol=1e-3, atol=1e-5)
