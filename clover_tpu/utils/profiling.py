"""Profiling helpers: step timing + jax.profiler trace capture.

First-class --profile support (SURVEY.md §5.1): the reference had only
wall-clock epoch logs; here a context manager captures an XLA trace
viewable in TensorBoard/Perfetto, and StepTimer gives p50/p90 step stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._seen = 0
        self._t_last: Optional[float] = None
        self.durations: List[float] = []

    def tick(self) -> Optional[float]:
        now = time.time()
        dt = None
        if self._t_last is not None:
            self._seen += 1
            if self._seen > self.warmup:
                dt = now - self._t_last
                self.durations.append(dt)
        self._t_last = now
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        arr = np.asarray(self.durations)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
