"""Profiling / tracing hooks (SURVEY.md §5.1 — absent in the reference).

- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace into the run directory (``--profile`` flag);
- ``StepTimer``: rolling per-step wall-time stats giving steps/sec and
  QA-pairs/sec beyond the reference's single ETA line.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace into ``log_dir/plugins/profile``."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling window of step durations -> steps/sec, samples/sec."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.durations: deque = deque(maxlen=window)
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.durations.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self.durations:
            return 0.0
        return len(self.durations) / sum(self.durations)

    @property
    def qa_pairs_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

    def summary(self) -> str:
        return (f"{self.steps_per_sec:.2f} steps/s | "
                f"{self.qa_pairs_per_sec:.0f} QA-pairs/s")
