"""Profiling hooks — the reference has none (SURVEY §5); these are the cheap
TPU-native wins: jax.profiler traces viewable in XProf/TensorBoard, and a
steady-state step timer that excludes compilation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with xprof / tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec with warmup exclusion and blocking fetches."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.t0: Optional[float] = None

    def tick(self, result=None):
        """Call once per step with a device value to block on (optional)."""
        self.count += 1
        if self.count == self.warmup:
            if result is not None:
                jax.block_until_ready(result)
            self.t0 = time.perf_counter()

    def steps_per_sec(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        if self.t0 is None or self.count <= self.warmup:
            return float("nan")
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)


def annotate(name: str):
    """Named trace region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
