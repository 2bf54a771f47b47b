"""Profiling / tracing hooks.

The reference has no profiler at all (SURVEY §5.1 — only ad-hoc
perf_counter loops, evaluate_quantization.py:261-263).  Here tracing is a
first-class trainer facility:

  - ``trace(logdir)``: context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the wrapped steps;
  - ``StepTimer``: wall-clock per-step timing with warm-up exclusion and
    rolling throughput, the structured replacement for the reference's
    first-iteration-excluded latency loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block into ``logdir``."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with warm-up exclusion (first ``skip`` steps)."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self._seen = 0
        self._total = 0.0
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip:
            self._total += dt
            self._count += 1
        return False

    @property
    def mean_seconds(self) -> float:
        return self._total / self._count if self._count else 0.0

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_seconds
        return items_per_step / s if s else 0.0
