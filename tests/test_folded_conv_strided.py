"""Exactness of the strided/grouped time-fold conv vs lax.conv_general_dilated.

Covers the MSD grouped-conv configs (reference discriminators.py:39-47) and
the NSF source-downsampling convs (hifigan_nsf.py noise_convs) that route
through ops/folded_conv.folded_conv1d_strided via models.commons.Conv1d.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.ops.folded_conv import folded_conv1d_strided

def _ref(x, w, s, p, g):
    return jax.lax.conv_general_dilated(
        x, w, (s,), ((p, p),), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=g,
    )


CASES = [
    # (T, Cin, Cout, K, stride, pad, groups)
    (1728, 16, 64, 41, 4, 20, 4),      # MSD layer 1 (short T)
    (1080, 256, 1024, 41, 4, 20, 64),  # MSD layer 3
    (270, 1024, 1024, 41, 4, 20, 256),  # MSD layer 4
    (1728, 1, 256, 80, 40, 20, 1),     # NSF noise conv, stride 40
    (1728, 1, 128, 8, 4, 2, 1),        # NSF noise conv, stride 4
    (1000, 8, 24, 7, 3, 3, 2),         # odd stride, output-trim path
    (997, 6, 12, 5, 2, 2, 3),          # T not divisible by fold
    (1728, 32, 1, 7, 1, 3, 1),         # generator conv_post (stride 1)
    (1728, 1, 16, 15, 1, 7, 1),        # MSD layer 0 (stride 1)
]


@pytest.mark.parametrize("T,ci,co,K,s,p,g", CASES)
def test_forward_matches_lax(T, ci, co, K, s, p, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, T, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, ci // g, co)), jnp.float32)
    y0 = _ref(x, w, s, p, g)
    y1 = folded_conv1d_strided(x, w, s, p, g)
    assert y1.shape == y0.shape
    rel = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-9))
    assert rel < 2e-6, rel


def test_gradients_match_lax():
    rng = np.random.default_rng(1)
    T, ci, co, K, s, p, g = 1080, 256, 1024, 41, 4, 20, 64
    x = jnp.asarray(rng.normal(size=(2, T, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, ci // g, co)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, T // s, co)), jnp.float32)

    def loss(fn, x, w):
        return jnp.vdot(fn(x, w), ct)

    gx0, gw0 = jax.grad(lambda x, w: loss(lambda a, b: _ref(a, b, s, p, g), x, w),
                        argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(
        lambda x, w: loss(lambda a, b: folded_conv1d_strided(a, b, s, p, g), x, w),
        argnums=(0, 1))(x, w)
    relx = float(jnp.max(jnp.abs(gx0 - gx1)) / (jnp.max(jnp.abs(gx0)) + 1e-9))
    # dW accumulates B*T_out near-cancelling terms; blocked vs sequential f32
    # summation order diverges at the 1e-3 level (verified exact in f64).
    relw = float(jnp.max(jnp.abs(gw0 - gw1)) / (jnp.max(jnp.abs(gw0)) + 1e-9))
    assert relx < 2e-6, relx
    assert relw < 1e-2, relw


def test_conv1d_module_routes_and_matches():
    """models.commons.Conv1d output is identical whether or not the folded
    path engages (toggled via the T>=256 gate)."""
    from rvc_tpu.models.commons import Conv1d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 1728, 16)), jnp.float32)
    m = Conv1d(64, 41, stride=4, groups=4, padding=20, use_weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), x)
    y_folded = m.apply(params, x)
    y_direct = m.apply(params, x[:, :192])  # short input -> direct lax path
    y_folded_short = y_folded[:, : y_direct.shape[1] - 10]
    y_direct_short = y_direct[:, : y_direct.shape[1] - 10]
    # interior outputs (away from the right boundary) must agree
    rel = float(jnp.max(jnp.abs(y_folded_short - y_direct_short))
                / (jnp.max(jnp.abs(y_direct_short)) + 1e-9))
    assert rel < 2e-6, rel
