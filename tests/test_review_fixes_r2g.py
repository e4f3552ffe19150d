"""Regression tests for the round-2g utils/predictors review findings:
banded viterbi decode, crepe capacity auto-detect, blender sr normalization,
install_model_archive path return, load_rvc_pth sr inference, shared cents
decode."""

import os

import numpy as np
import pytest


def test_banded_viterbi_matches_dense():
    """The banded DP must equal a dense -inf-out-of-band viterbi."""
    from rvc_tpu.predictors.cents import weighted_cents_decode
    from rvc_tpu.predictors.crepe import _VITERBI_W, _decode_viterbi

    rng = np.random.default_rng(0)
    sal = rng.random((120, 360)).astype(np.float32) ** 4

    t, n = sal.shape
    d = np.arange(n)
    w = np.maximum(_VITERBI_W - np.abs(d[:, None] - d[None, :]), 0).astype(
        np.float64)
    trans = w / w.sum(axis=1, keepdims=True)
    log_trans = np.where(trans > 0, np.log(np.maximum(trans, 1e-300)), -np.inf)
    obs = sal.astype(np.float64)
    obs = obs / np.maximum(obs.sum(axis=1, keepdims=True), 1e-12)
    log_obs = np.log(obs + 1e-12)
    dp = np.full(n, np.log(1.0 / n)) + log_obs[0]
    back = np.zeros((t, n), np.int32)
    for i in range(1, t):
        scores = dp[:, None] + log_trans
        back[i] = scores.argmax(axis=0)
        dp = scores.max(axis=0) + log_obs[i]
    path = np.zeros(t, np.int32)
    path[-1] = dp.argmax()
    for i in range(t - 2, -1, -1):
        path[i] = back[i + 1, path[i + 1]]
    dense_cents = weighted_cents_decode(sal, path)

    np.testing.assert_allclose(_decode_viterbi(sal), dense_cents)


def test_crepe_capacity_autodetect(tmp_path):
    import torch

    from rvc_tpu.predictors.crepe import CREPE, CrepeModel
    import jax, jax.numpy as jnp

    # build a tiny-capacity torch-style state dict from flax init shapes
    variables = CrepeModel("tiny").init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 1024)))
    sd = {}
    p, s = variables["params"], variables["batch_stats"]
    for i in range(1, 7):
        k = np.asarray(p[f"conv{i}"]["kernel"])  # [K, 1, in, out]
        sd[f"conv{i}.weight"] = torch.from_numpy(
            np.transpose(k, (3, 2, 0, 1)))
        sd[f"conv{i}.bias"] = torch.from_numpy(np.asarray(p[f"conv{i}"]["bias"]))
        sd[f"conv{i}_BN.weight"] = torch.from_numpy(np.asarray(p[f"bn{i}"]["scale"]))
        sd[f"conv{i}_BN.bias"] = torch.from_numpy(np.asarray(p[f"bn{i}"]["bias"]))
        sd[f"conv{i}_BN.running_mean"] = torch.from_numpy(np.asarray(s[f"bn{i}"]["mean"]))
        sd[f"conv{i}_BN.running_var"] = torch.from_numpy(np.asarray(s[f"bn{i}"]["var"]))
    sd["classifier.weight"] = torch.from_numpy(
        np.asarray(p["classifier"]["kernel"]).T)
    sd["classifier.bias"] = torch.from_numpy(np.asarray(p["classifier"]["bias"]))
    path = str(tmp_path / "crepe.pt")
    torch.save(sd, path)

    # requesting "full" with a tiny checkpoint must auto-correct, not crash
    m = CREPE.from_torch_checkpoint(path, "full")
    assert m.model.capacity == "tiny"


def test_blender_sr_normalization(tmp_path):
    from rvc_tpu.utils.checkpoints import save_checkpoint
    from rvc_tpu.utils.model_tools import model_blender

    params = {"w": np.ones((2, 2), np.float32)}
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    # '48k' string vs 48000 int must blend (reference EXTRAS normalize_sr)
    save_checkpoint(a, params, {"sample_rate": "48k"})
    save_checkpoint(b, params, {"sample_rate": 48000})
    out = model_blender("ab", a, b, 0.5, output_dir=str(tmp_path))
    assert os.path.exists(out)
    # genuinely different rates still raise
    c = str(tmp_path / "c.npz")
    save_checkpoint(c, params, {"sample_rate": 32000})
    with pytest.raises(ValueError):
        model_blender("ac", a, c, 0.5, output_dir=str(tmp_path))


def test_install_model_archive_returns_path(tmp_path):
    from rvc_tpu.utils.downloads import install_model_archive

    src = tmp_path / "my model.pth"
    src.write_bytes(b"x")
    out_dir = str(tmp_path / "out dir")  # spaces must not break the result
    dest = install_model_archive(str(src), out_dir)
    assert os.path.exists(dest)
    assert dest == os.path.join(out_dir, "my model.pth")


def test_load_rvc_pth_infers_sr_from_shapes(tmp_path, capsys):
    """A full-training-format ckpt (no sr/config metadata) must get its
    sample rate from the first ConvTranspose kernel size."""
    import torch

    from rvc_tpu.utils import checkpoints as C

    # minimal fake: only the key the sr sniffing looks at, plus a tensor
    # layout the converter can't fully parse — so call just the metadata
    # path via load_rvc_pth and catch the conversion error if any.
    sd = {"dec.ups.0.weight_v": torch.zeros((256, 128, 20))}
    cpt = {"model": sd, "iteration": 5}
    path = str(tmp_path / "G_full.pth")
    torch.save(cpt, path)
    try:
        _, meta = C.load_rvc_pth(path)
    except Exception:
        # conversion of the incomplete tree may fail; the sr inference
        # message must still have been printed before that
        meta = None
    out = capsys.readouterr().out
    assert "inferred sample_rate=32000" in out
    if meta is not None:
        assert meta["sr"] == 32000


def test_shared_cents_decode_jnp_matches_np():
    import jax.numpy as jnp

    from rvc_tpu.predictors.cents import weighted_cents_decode

    rng = np.random.default_rng(1)
    sal = rng.random((50, 360)).astype(np.float32)
    center = sal.argmax(axis=1)
    a = weighted_cents_decode(sal, center)
    b = np.asarray(weighted_cents_decode(
        jnp.asarray(sal), jnp.asarray(center), xp=jnp,
        cents_dtype=np.float32))
    np.testing.assert_allclose(a, b, rtol=1e-5)
