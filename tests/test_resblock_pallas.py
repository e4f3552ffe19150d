"""Fused ResBlock Pallas kernel vs the direct conv chain (interpret mode on
CPU; the real Mosaic path is exercised on TPU by the bench/pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.ops.resblock_pallas import fused_resblock

pytestmark = pytest.mark.slow


def _direct(x, k1, b1, k2, b2, dil, K):
    def lrelu(a):
        return jnp.where(a >= 0, a, a * 0.1)

    y = x
    for d, w1, bb1, w2, bb2 in zip(dil, k1, b1, k2, b2):
        pad = (K * d - d) // 2
        a = lrelu(y)
        m = jax.lax.conv_general_dilated(
            a, w1, (1,), ((pad, pad),), rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC")) + bb1
        a2 = lrelu(m)
        c = jax.lax.conv_general_dilated(
            a2, w2, (1,), (((K - 1) // 2, (K - 1) // 2),),
            dimension_numbers=("NHC", "HIO", "NHC")) + bb2
        y = y + c
    return y


@pytest.mark.parametrize("T,C,K,tile", [
    (32768, 32, 11, 1024),
    (32768, 32, 3, 1024),
    (16384, 64, 7, 2048),     # ragged folded tiles
    (21504, 128, 11, 512),    # fold = 1
])
def test_fused_resblock_matches_direct(T, C, K, tile):
    rng = np.random.default_rng(0)
    dil = (1, 3, 5)
    x = jnp.asarray(rng.normal(size=(1, T, C)), jnp.float32)
    k1 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b1 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32) for _ in dil]
    k2 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b2 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32) for _ in dil]

    ref = _direct(x, k1, b1, k2, b2, dil, K)
    out = fused_resblock(x, k1, b1, k2, b2, dil, tile=tile, interpret=True)
    rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert rel < 5e-6, rel


def test_fused_resblock_batch():
    rng = np.random.default_rng(1)
    T, C, K = 32768, 32, 3
    dil = (1, 3)
    x = jnp.asarray(rng.normal(size=(2, T, C)), jnp.float32)
    k1 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b1 = [jnp.zeros((C,), jnp.float32) for _ in dil]
    k2 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b2 = [jnp.zeros((C,), jnp.float32) for _ in dil]
    ref = _direct(x, k1, b1, k2, b2, dil, K)
    out = fused_resblock(x, k1, b1, k2, b2, dil, tile=1024, interpret=True)
    rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert rel < 5e-6, rel


def test_fused_resblock_grad(tmp_path):
    """custom_vjp: gradients flow (direct-conv recompute backward)."""
    rng = np.random.default_rng(2)
    T, C, K = 32768, 32, 3
    dil = (1, 3)
    x = jnp.asarray(rng.normal(size=(1, T, C)) * 0.1, jnp.float32)
    k1 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b1 = [jnp.zeros((C,), jnp.float32) for _ in dil]
    k2 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b2 = [jnp.zeros((C,), jnp.float32) for _ in dil]

    def loss_pallas(x, k1):
        return jnp.sum(fused_resblock(x, k1, b1, k2, b2, dil, tile=1024,
                                      interpret=True) ** 2)

    def loss_direct(x, k1):
        from rvc_tpu.ops.resblock_pallas import _direct_chain

        return jnp.sum(_direct_chain(x, k1, b1, k2, b2, dil, 0.1) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, k1)
    gd = jax.grad(loss_direct, argnums=(0, 1))(x, k1)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gd)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, rel


def test_fused_resblock_bf16_io():
    """bf16 I/O path: DMA in the caller's dtype, f32 math in VMEM.
    Tolerance covers bf16 storage between the two chain stages."""
    rng = np.random.default_rng(3)
    T, C, K = 16384, 32, 3
    dil = (1, 3, 5)
    xb = jnp.asarray(rng.normal(size=(1, T, C)) * 0.3, jnp.bfloat16)
    k1 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b1 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32) for _ in dil]
    k2 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
          for _ in dil]
    b2 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32) for _ in dil]
    ref = _direct(xb.astype(jnp.float32), k1, b1, k2, b2, dil, K)
    out = fused_resblock(xb, k1, b1, k2, b2, dil, tile=1024, interpret=True)
    assert out.dtype == jnp.bfloat16
    rel = float(jnp.abs(ref - out.astype(jnp.float32)).max()
                / jnp.abs(ref).max())
    assert rel < 2e-2, rel


def test_fused_mrf_matches_direct_sum():
    """Stage-tail fusion: mean of 3 chains (k=3/7/11, dilations 1/3/5) in
    one kernel equals the per-chain direct computation."""
    from rvc_tpu.ops.resblock_pallas import fused_mrf, mrf_weight_bytes

    rng = np.random.default_rng(4)
    T, C = 16384, 32
    dil = (1, 3, 5)
    kernel_sizes = (3, 7, 11)
    x = jnp.asarray(rng.normal(size=(1, T, C)) * 0.3, jnp.float32)
    chains = []
    ref = None
    for K in kernel_sizes:
        k1 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
              for _ in dil]
        b1 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
              for _ in dil]
        k2 = [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
              for _ in dil]
        b2 = [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
              for _ in dil]
        chains.append((k1, b1, k2, b2))
        y = _direct(x, k1, b1, k2, b2, dil, K)
        ref = y if ref is None else ref + y
    ref = ref / len(kernel_sizes)
    assert mrf_weight_bytes(C, T, kernel_sizes, dil) <= 6 * 2 ** 20
    out = fused_mrf(x, chains, kernel_sizes, dil, tile=1024, interpret=True)
    rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert rel < 5e-6, rel


def test_fused_mrf_grad_flows():
    from rvc_tpu.ops.resblock_pallas import fused_mrf

    rng = np.random.default_rng(5)
    T, C, dil, ks = 4096, 8, (1, 3), (3, 5)
    x = jnp.asarray(rng.normal(size=(1, T, C)) * 0.3, jnp.float32)
    chains = []
    for K in ks:
        chains.append((
            [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
             for _ in dil],
            [jnp.zeros((C,), jnp.float32) for _ in dil],
            [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
             for _ in dil],
            [jnp.zeros((C,), jnp.float32) for _ in dil],
        ))
    g = jax.grad(
        lambda x: fused_mrf(x, chains, ks, dil, tile=512,
                            interpret=True).sum()
    )(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())


def test_bf16_roll_is_pure_data_movement():
    """The fused_mrf bf16 fast path relies on cast-then-roll == roll-then-
    cast (roll is pure data movement). Pin that invariant directly for the
    shift set the tap plans actually use."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(1040, 128)).astype(np.float32)
    for s in (-3, -1, 1, 2, 5):
        rolled_then_cast = jnp.roll(jnp.asarray(a), -s, axis=0).astype(
            jnp.bfloat16)
        cast_then_rolled = jnp.roll(jnp.asarray(a).astype(jnp.bfloat16),
                                    -s, axis=0)
        assert bool((rolled_then_cast == cast_then_rolled).all()), s


def test_fused_mrf_bf16_matches_direct():
    """bf16-input fused_mrf (bf16 dots, unconditional since round 4)
    tracks the f32 direct chain within bf16 tolerance."""
    from rvc_tpu.ops import resblock_pallas as rp

    rng = np.random.default_rng(13)
    T, C = 4096, 32
    dil = (1, 3, 5)
    kernel_sizes = (3, 7, 11)
    x32 = jnp.asarray(rng.normal(size=(1, T, C)) * 0.3, jnp.float32)
    chains = []
    for K in kernel_sizes:
        chains.append((
            [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
             for _ in dil],
            [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
             for _ in dil],
            [jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.float32)
             for _ in dil],
            [jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
             for _ in dil],
        ))
    ref = rp._direct_mrf(x32, chains, kernel_sizes, dil, 0.1)
    out = rp.fused_mrf(x32.astype(jnp.bfloat16), chains, kernel_sizes, dil,
                       tile=512, interpret=True)
    assert out.dtype == jnp.bfloat16
    rel = float(jnp.abs(ref - out.astype(jnp.float32)).max()
                / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.1, rel  # bf16 storage + bf16 dots vs f32 chain
