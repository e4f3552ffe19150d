"""Numerics parity: our flax HuBERT vs torch transformers.HubertModel with
identical (randomly initialized, converted) weights."""

import numpy as np
import pytest

jaxlib = pytest.importorskip("jax")
import jax.numpy as jnp

from rvc_tpu.embedders import FlaxHubert, HubertConfig, convert_torch_hubert

pytestmark = pytest.mark.slow  # jit-compiles models; see pytest.ini


@pytest.fixture(scope="module")
def torch_hubert():
    torch = pytest.importorskip("torch")
    import transformers

    tcfg = transformers.HubertConfig()  # hubert-base defaults
    torch.manual_seed(0)
    model = transformers.HubertModel(tcfg).eval()
    return torch, model


def test_flax_hubert_matches_torch(torch_hubert):
    torch, model = torch_hubert
    cfg = HubertConfig()
    params = convert_torch_hubert(model.state_dict(), cfg)
    fx = FlaxHubert(cfg)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, 16000)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = model(torch.from_numpy(audio)).last_hidden_state.numpy()

    out = np.asarray(fx.apply({"params": params}, jnp.asarray(audio)))
    assert out.shape == ref.shape  # [1, 49, 768]
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 5e-3, f"relative max err {err}"


def test_frame_rate_is_320(torch_hubert):
    _, model = torch_hubert
    cfg = HubertConfig()
    params = convert_torch_hubert(model.state_dict(), cfg)
    out = FlaxHubert(cfg).apply(
        {"params": params}, jnp.zeros((1, 320 * 50 + 80))
    )
    # conv stack: valid padding -> floor((T - 400)/320) + 1 frames
    assert out.shape[1] == (320 * 50 + 80 - 400) // 320 + 1
