"""Profiling helpers (SURVEY.md §5.1 — the reference has only AverageMeter
timing lines; the rebuild exposes real device traces).

``trace(dir)``: context manager around ``jax.profiler`` producing a
Perfetto/TensorBoard-compatible trace of device execution.
``StepTimer``: wall-clock per-step timing with jitted-dispatch awareness
(synchronizes on a provided array before reading the clock).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step timer that forces a device sync on a result array."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        if sync_array is not None:
            jax.block_until_ready(sync_array)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def percentile(self, p: float) -> float:
        if not self.times:
            return 0.0
        xs = sorted(self.times)
        i = min(int(len(xs) * p / 100.0), len(xs) - 1)
        return xs[i]

    @property
    def p50(self) -> float:
        return self.percentile(50)

    @property
    def p99(self) -> float:
        return self.percentile(99)
