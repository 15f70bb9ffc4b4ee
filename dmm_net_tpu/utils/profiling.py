"""Profiling / tracing harness (SURVEY.md §6 "Tracing / profiling" row).

The reference has only wall-clock MetricLogger timers. Here:
  * `trace(logdir)` context manager wrapping jax.profiler (Perfetto/XPlane
    traces viewable in TensorBoard or ui.perfetto.dev);
  * `StageTimer` for coarse per-stage wall times with device sync —
    the quick "where did the millisecond go" tool used by bench/.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock stage timer with block_until_ready syncs.

    with timer.stage("backbone"): feats = model(...)
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            elif "sync" in out:
                jax.block_until_ready(out["sync"])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {t * 1e3:9.2f} ms total "
                         f"{t / n * 1e3:8.3f} ms/call x{n:4d} "
                         f"{100 * t / max(total, 1e-9):5.1f}%")
        return "\n".join(lines)
