"""Profiling hooks: step timers and jax.profiler trace contexts.

The reference has no observability beyond tqdm; here step timing feeds the
benchmark harness and traces can be captured for xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


class StepTimer:
    """Wall-clock step timer with warmup discard and simple stats."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


@contextlib.contextmanager
def trace_context(log_dir: Optional[str] = None):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
