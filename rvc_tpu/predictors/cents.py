"""Shared 360-bin cents decode used by the CREPE and RMVPE predictors.

Both models emit salience over the same 360 20-cent bins starting at
1997.379... cents (reference RMVPE.py:459-512, torchcrepe core) and decode
f0 with the identical 9-tap weighted local average around a center bin —
this module is the single definition of that constant and kernel so the
implementations cannot drift apart.
"""

from __future__ import annotations

import numpy as np

N_CLASS = 360
CENTS_MAPPING = 20.0 * np.arange(N_CLASS) + 1997.3794084376191

_PAD = 4  # 9-tap window half-width


def weighted_cents_decode(salience, center, xp=np, cents_dtype=None):
    """9-tap weighted average of cents around `center` bins.

    salience: [T, 360]; center: [T] int bin indices (e.g. argmax or a
    viterbi path). `xp` is the array namespace (numpy for host decode,
    jax.numpy inside jitted graphs). Returns [T] average cents.
    """
    cents = np.pad(CENTS_MAPPING, (_PAD, _PAD))
    if cents_dtype is not None:
        cents = cents.astype(cents_dtype)
    cents = xp.asarray(cents)
    padded = xp.pad(salience, ((0, 0), (_PAD, _PAD)))
    idx = center[:, None] + xp.arange(2 * _PAD + 1)[None, :]
    w = xp.take_along_axis(padded, idx, axis=1)
    c = cents[idx]
    return (w * c).sum(axis=1) / xp.maximum(w.sum(axis=1), 1e-12)
