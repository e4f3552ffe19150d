"""Tracing / profiling: first-class observability the reference lacks.

The reference's only timing is wall-clock prints (EpochRecorder
rvc/train/train.py:262-280, conversion elapsed rvc/infer/infer.py:342-345).
Here: jax.profiler device traces (viewable in TensorBoard/XProf or Perfetto),
named trace annotations for pipeline stages, and a lightweight wall-clock
stage timer that aggregates across calls.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace (xplane) under log_dir/plugins/profile."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Aggregating wall-clock timer for pipeline stages."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals)
        }

    def dump(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.summary(), indent=2)
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "w") as f:
                f.write(text)
        return text


def memory_stats() -> Dict[str, int]:
    """Per-device live memory (bytes) when the backend exposes it."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = int(s.get("bytes_in_use", 0))
        except Exception:
            pass
    return out
