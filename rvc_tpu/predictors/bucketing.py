"""Length bucketing for the jitted f0 predictors.

The reference runs eager torch, so every audio length just works; under jit,
each distinct input shape is a separate XLA compile. All predictors therefore
pad audio up to canonical 1-second buckets (one compiled program per bucket,
~65 programs over the whole operating range) and slice the true frame count
off on the host. Reflect padding is used because it extends the signal with
the values a centered/reflect-padded STFT would synthesize anyway; true
frames match the unpadded run exactly except, when the bucket boundary falls
within half a window of the true end, the last 2-3 edge frames (whose windows
always contained synthetic padding) can differ microscopically.
"""

from __future__ import annotations

import numpy as np

SR = 16000


def bucket_samples(t: int, step: int = SR) -> int:
    """Round a sample count up to the next multiple of `step` (min 1 step)."""
    return max(step, ((t + step - 1) // step) * step)


def reflect_to(audio: np.ndarray, target: int) -> np.ndarray:
    """Right-pad `audio` to `target` samples by (repeated) reflection."""
    out = np.asarray(audio, np.float32)
    while len(out) < target:
        pad = min(target - len(out), max(len(out) - 1, 1))
        mode = "reflect" if len(out) > 1 else "edge"
        out = np.pad(out, (0, pad), mode=mode)
    return out
