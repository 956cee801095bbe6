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


class SyncedRateTracker:
    """Throughput from host-sync boundaries (accurate under async dispatch).

    ``tick()`` per dispatched step is misleading on this runtime: train_step
    returns before device execution (and the tunnel's block_until_ready is a
    no-op), so dispatch-paced durations overreport throughput. This tracker
    is updated only at points where a device value was just fetched (the
    loss read at each log interval) and derives the rate from (steps, wall
    time) deltas between those true barriers.
    """

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._last: tuple[int, float] | None = None
        self._rate = 0.0

    def mark(self, step: int) -> None:
        """Call immediately after fetching a device value at ``step``."""
        now = time.perf_counter()
        if self._last is not None:
            dsteps = step - self._last[0]
            dt = now - self._last[1]
            if dsteps > 0 and dt > 0:
                self._rate = dsteps / dt
        self._last = (step, now)

    @property
    def steps_per_sec(self) -> float:
        return self._rate

    @property
    def qa_pairs_per_sec(self) -> float:
        return self._rate * self.batch_size

    def summary(self) -> str:
        return (f"{self.steps_per_sec:.2f} steps/s | "
                f"{self.qa_pairs_per_sec:.0f} QA-pairs/s")


class StepTimer:
    """Rolling window of *dispatch* durations -> steps/sec, samples/sec.

    Measures host-loop pacing, not device execution — use
    :class:`SyncedRateTracker` for logged throughput (async dispatch makes
    per-step wall times meaningless until a sync point)."""

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
