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

import jax
import jax.numpy as jnp


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
