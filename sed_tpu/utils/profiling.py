"""Profiling / tracing hooks.

The reference has no tracing at all — only wall-clock prints
(``main_strong.py:767,838-841``; SURVEY §5).  This provides:

* ``trace(logdir)``: a context manager around ``jax.profiler`` so any
  block (a train step, the serving loop) emits a TensorBoard-loadable
  device trace;
* ``StepTimer``: a lightweight rolling step timer for train loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec and examples/sec."""

    def __init__(self, window: int = 50):
        self._times: deque = deque(maxlen=window)
        self._counts: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def step(self, examples: int = 1) -> None:
        now = time.time()
        if self._last is not None:
            self._times.append(now - self._last)
            self._counts.append(examples)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        total = sum(self._times)
        return len(self._times) / total if total else 0.0

    @property
    def examples_per_sec(self) -> float:
        total = sum(self._times)
        return sum(self._counts) / total if total else 0.0
