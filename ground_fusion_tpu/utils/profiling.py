"""Timing & statistics: TicToc stopwatch, rolling stage means, printStatistics.

The reference wraps tracker/solver/marginalization in ``TicToc``
(``utility/tic_toc.h``) and accumulates rolling solver/marg means
(``estimator.h:190-193``; ``printStatistics``). Same surface here, plus a
context-manager hook into ``jax.profiler`` traces for device-side profiling
(SURVEY §5 tracing upgrade)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class TicToc:
    """utility/tic_toc.h equivalent."""

    def __init__(self):
        self.tic()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        """Milliseconds since tic."""
        return (time.perf_counter() - self._t0) * 1e3


class StageStats:
    """Rolling per-stage timing means (sum_t_solver / frame_cnt analog)."""

    def __init__(self):
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t = TicToc()
        try:
            yield
        finally:
            self.sums[name] += t.toc()
            self.counts[name] += 1

    def add(self, name: str, ms: float):
        self.sums[name] += ms
        self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.sums[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = [
            f"{k}: mean {self.mean(k):.2f} ms over {self.counts[k]}"
            for k in sorted(self.sums)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace wrapper — open in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
