"""Profiling: per-stage wall-clock timers + jax.profiler integration.

The structured replacement for the reference's coarse per-frame INFO logs
(scene_flow_constructor.cpp:394-395, clusterer_nodelet.cpp:240-241): named
stage timers with p50/p95 summaries, and a context manager around
``jax.profiler.trace`` for full XLA traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage.

    Usage::

        timer = StageTimer()
        with timer.stage("sgm"):
            ... # host-side section; device work must be blocked on
        print(timer.report())
    """

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self.samples[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self.samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<20} {'n':>5} {'mean':>8} {'p50':>8} {'p95':>8}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<20} {s['count']:>5} {s['mean_ms']:>7.2f}ms "
                f"{s['p50_ms']:>7.2f}ms {s['p95_ms']:>7.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace_context(log_dir: str | None) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when ``log_dir`` is given;
    no-op otherwise (compute-on-demand observability, like the reference's
    subscriber-gated debug publishers, SURVEY.md §5)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
