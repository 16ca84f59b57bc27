"""Timing + profiling harness (SURVEY.md §5: the reference's getTime() is
dead code; this is its live equivalent).

``StageTimer`` gives per-stage wall timings with ``block_until_ready``
semantics (device work is async — naive timing measures dispatch, not
compute).  ``trace`` wraps ``jax.profiler`` for Perfetto/XPlane dumps.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def time_fn(self, name: str, fn, *args, warmup: int = 1, reps: int = 5):
        """Compile-excluded average wall time of fn(*args)."""
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / reps
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    def report(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpuvo_trace"):
    """jax.profiler trace context (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
