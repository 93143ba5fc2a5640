"""Profiling helpers.

The reference's only tracing was callgrind hooks compile-gated around the
GuessGenerator hot section plus raw cout progress lines (SURVEY.md section 5).
Here: jax.profiler trace capture around any region, a pipelined wall-clock
timer that works through async dispatch (a scalar download is the only true
sync on some backends — see tools/timing.py for the measurement rationale),
and the per-cell scheduler timing lives in pipeline.scheduler.timing_report.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tod_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, n: int = 20, warmup: int = 1) -> float:
    """Average seconds per call of a jitted fn, with a HARD device sync
    (scalar reduction + download) draining the async dispatch pipeline."""
    import jax

    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(sum(np.asarray(l, dtype=np.float64).sum()
                         for l in map(jax.device_get, leaves[:1])))

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


class StageTimer:
    """Accumulate named wall-clock stages (host-side; for pipeline cells use
    Scheduler.timing_report)."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [f"  {k:<24} {v*1e3:8.2f} ms ({100*v/total:4.1f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
