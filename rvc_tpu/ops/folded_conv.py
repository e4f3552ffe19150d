"""Time-folded 1D convolution: exact reformulation for small-channel convs.

The HiFi-GAN decoder tail runs dozens of convolutions with 32-64 channels
over ~1e6 samples. The TPU MXU is a 128x128 systolic array, so a C=32 conv
uses ~6% of it and the op is utilization-bound (measured ~4.5 ms per conv at
T=863k on v5e). Folding F consecutive samples into the channel axis
(x' [T/F, F*C]) and scattering the taps into a block matrix W' [D, F*Cin,
F*Cout] computes the SAME sums with 128-wide contractions:

    y[t'*F + p] = sum_k x[t'*F + p + (k-c)*d] @ w[k]
               = sum_j x'[t' + j + off] @ W'[j]   (j over folded taps)

MAC count rises ~F*D/K-fold (the scattered blocks are sparse) but MXU
utilization rises ~F^2, a large net win for C << 128. Measured: the stage-4
resblock chain drops from ~22 ms to a few ms. The transform is exact up to
fp summation order; it is differentiable, so training uses it too.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def fold_weights(kernel: jax.Array, dilation: int, fold: int):
    """[K, Cin, Cout] -> (W' [D, fold*Cin, fold*Cout], delta_min).

    W'[delta - delta_min] holds kernel[k] at block (p_in, p_out) for every
    (p_out, k) with p_out + (k - center)*dilation = delta*fold + p_in.
    Contiguous delta range (zero blocks included) — for conv-primitive use.
    """
    K, cin, cout = kernel.shape
    center = (K - 1) // 2
    positions = [
        (p_out, k, p_out + (k - center) * dilation)
        for p_out in range(fold)
        for k in range(K)
    ]
    d_min = min(pos // fold for (_, _, pos) in positions)
    d_max = max(pos // fold for (_, _, pos) in positions)
    D = d_max - d_min + 1
    wf = jnp.zeros((D, fold * cin, fold * cout), kernel.dtype)
    for p_out, k, pos in positions:
        d_idx = pos // fold - d_min
        p_in = pos % fold
        wf = wf.at[
            d_idx, p_in * cin : (p_in + 1) * cin,
            p_out * cout : (p_out + 1) * cout,
        ].add(kernel[k])
    return wf, d_min


def fold_weights_sparse(kernel: jax.Array, dilation: int, fold: int):
    """Like fold_weights but only deltas that receive any weight:
    -> (W' [len(deltas), fold*Cin, fold*Cout], deltas list). For dilated
    kernels most contiguous deltas are zero blocks; skipping them cuts both
    VMEM and MXU work in the Pallas kernel."""
    K, cin, cout = kernel.shape
    center = (K - 1) // 2
    positions = [
        (p_out, k, p_out + (k - center) * dilation)
        for p_out in range(fold)
        for k in range(K)
    ]
    deltas = sorted({pos // fold for (_, _, pos) in positions})
    d_index = {d: i for i, d in enumerate(deltas)}
    wf = jnp.zeros((len(deltas), fold * cin, fold * cout), kernel.dtype)
    for p_out, k, pos in positions:
        wf = wf.at[
            d_index[pos // fold], (pos % fold) * cin : (pos % fold + 1) * cin,
            p_out * cout : (p_out + 1) * cout,
        ].add(kernel[k])
    return wf, deltas


def folded_conv1d(
    x: jax.Array,          # [B, T, Cin], T % fold == 0
    kernel: jax.Array,     # [K, Cin, Cout], K odd
    dilation: int = 1,
    fold: int = 8,
) -> jax.Array:
    """'Same'-padded dilated conv via the time-fold transform (exact)."""
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    assert t % fold == 0 and k % 2 == 1
    center = (k - 1) // 2
    pad_amt = center * dilation
    p_blocks = -(-pad_amt // fold)

    wf, d_min = fold_weights(kernel, dilation, fold)
    d_taps = wf.shape[0]

    xp = jnp.pad(x, ((0, 0), (p_blocks * fold, p_blocks * fold), (0, 0)))
    xf = xp.reshape(b, t // fold + 2 * p_blocks, fold * cin)
    lo = p_blocks + d_min
    xf = xf[:, lo : lo + t // fold + d_taps - 1]
    y = jax.lax.conv_general_dilated(
        xf, wf, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
    )
    return y.reshape(b, t, cout)


@lru_cache(maxsize=None)
def _strided_fold_map(K: int, stride: int, fold: int):
    """Static 0/1 scatter map M [D, fold, P, K] for the strided fold.

    Output sample o = i*P + p_out (P = fold // stride outputs per input
    block of `fold` samples) reads padded-input sample o*stride + k, i.e.
    block-relative position pos = p_out*stride + k, which lands in input
    block i + pos//fold at folded lane pos%fold:

        M[pos//fold, pos%fold, p_out, k] = 1.
    """
    P = fold // stride
    D = -(-((P - 1) * stride + K) // fold)
    M = np.zeros((D, fold, P, K), np.float32)
    for p_out in range(P):
        for k in range(K):
            pos = p_out * stride + k
            M[pos // fold, pos % fold, p_out, k] = 1.0
    return M, D, P


def folded_conv1d_strided(
    x: jax.Array,        # [B, T, Cin]
    kernel: jax.Array,   # [K, Cin // groups, Cout], group-major Cout
    stride: int,
    padding: int,
    groups: int = 1,
    fold: int | None = None,
) -> jax.Array:
    """Strided (optionally grouped) 1D conv via the time-fold transform.

    Exact torch-semantics conv (out = (T + 2p - K)//s + 1) recast as D
    batched matmuls whose contraction (fold*ci) and output (P*co) widths
    fill the 128-lane MXU. This is the TPU answer to the reference MSD's
    grouped convs (per-group width 4, discriminators.py:39-47) and the NSF
    source-downsampling convs (1 input channel, utils shapes) — the direct
    lax.conv lowering of those runs below 1% MXU utilization, and its
    weight/input gradients lower to the same starved shapes. Differentiable:
    the backward passes are matmuls of the same folded widths.
    """
    b, t, c = x.shape
    K, cig, cout = kernel.shape
    ci, co = cig, cout // groups
    s = int(stride)
    if fold is None:
        # Fill both MXU faces: contraction fold*ci >= 128 where the MAC
        # overhead (~D*fold/K) stays modest, output P*co >= 128. The cap
        # still lets very narrow inputs (ci=1..8) reach a 128-wide
        # contraction — the absolute FLOPs there are tiny.
        fold = max(s, s * (128 // max(co, 1)), -(-128 // max(ci, 1)))
        cap = max(16 * s, -(-128 // max(ci, 1)) * s)
        # every candidate must stay a multiple of s (hard cap included,
        # else strides that don't divide 512 trip the fold % s assert)
        fold = min(-(-fold // s) * s, cap, max(s, 512 // s * s))
    assert fold % s == 0
    M, D, P = _strided_fold_map(K, s, fold)
    t_out = (t + 2 * padding - K) // s + 1
    blocks_out = -(-t_out // P)

    # Pad: conv padding on the left; right covers blocks_out + D tap blocks.
    need = (blocks_out - 1 + D) * fold
    pad_r = need - (padding + t)
    xp = jnp.pad(x, ((0, 0), (padding, max(pad_r, 0)), (0, 0)))
    if pad_r < 0:
        xp = xp[:, :need]
    # [B, Nb, fold, g, ci] -> [B, Nb, g, fold*ci]
    xf = xp.reshape(b, need // fold, fold, groups, ci)
    xf = xf.transpose(0, 1, 3, 2, 4).reshape(b, need // fold, groups, fold * ci)

    # W' [D, g, fold*ci, P*co]: scatter taps via the static 0/1 map (einsum
    # with a constant — the kernel gradient stays a dense matmul).
    kg = kernel.reshape(K, ci, groups, co)
    Mj = jnp.asarray(M, kernel.dtype)
    wf = jnp.einsum("dfpk,krgc->dgfrpc", Mj, kg)
    wf = wf.reshape(D, groups, fold * ci, P * co)

    acc = None
    for d in range(D):
        xd = jax.lax.slice_in_dim(xf, d, d + blocks_out, axis=1)
        # batch g, contract fold*ci -> [g, B, blocks_out, P*co]
        yd = jax.lax.dot_general(
            xd,
            wf[d],
            dimension_numbers=(((3,), (1,)), ((2,), (0,))),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        acc = yd if acc is None else acc + yd
    y = acc.astype(kernel.dtype)
    y = y.reshape(groups, b, blocks_out, P, co)
    y = y.transpose(1, 2, 3, 0, 4).reshape(b, blocks_out * P, groups * co)
    return y[:, :t_out]
