"""Profiling hooks: jax.profiler traces and step timing.

The reference has no profiling beyond wall-clock per epoch
(reference: core/exec.py:153, 210-211); here a trace context and an
EMA step timer are first-class so perf regressions are observable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is configured, no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA of step wall time; call .tick() once per step."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else \
                self.alpha * dt + (1 - self.alpha) * self.ema
        self._last = now
        return self.ema
