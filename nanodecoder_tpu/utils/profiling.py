"""Per-stage wall-clock timers + jax.profiler hooks.

SURVEY.md §5.1: the reference has no profiling beyond throughput
counters; the TPU build tracks ingest/encode/decode/stitch stage times
from day one and can capture device traces via jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating named wall-clock timers.

    with timer.stage("decode"): ...
    timer.summary() -> {"decode": {"total_sec": ..., "count": ...}, ...}
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_sec": self.totals[name],
                "count": self.counts[name],
                "mean_sec": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler device trace into log_dir (no-op if None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
