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


def consume(carry, out):
    """Fold a REAL (non-elidable) scalar dependency on ``out`` into
    ``carry`` so a timed stage cannot be dead-code-eliminated.

    Do NOT use ``carry + 0 * scalar`` for this: for integer scalars XLA
    constant-folds ``0 * x`` to 0 and then deletes the whole stage.
    ``.at[0...].add(scalar)`` is a true data dependency (the tiny value
    drift is irrelevant for timing).
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    scalar = jnp.ravel(leaf)[0]
    first = jax.tree_util.tree_leaves(carry)[0]
    bumped = first.at[(0,) * first.ndim].add(scalar.astype(first.dtype))
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    return jax.tree_util.tree_unflatten(treedef, [bumped] + leaves[1:])


def chain_slope_ms(
    step, init, n1: int = 20, n2: int = 120, samples: int = 3
) -> float:
    """Per-step device time of ``step`` (pytree -> same-structure pytree),
    measured as the median slope between two jitted ``fori_loop`` chain
    lengths.

    This is the only reliable protocol on the tunneled TPU backend:
    ``jax.block_until_ready`` can return before device work finishes there,
    so completion is forced with a host fetch of one scalar, and the fixed
    dispatch round trip (~25-100 ms, high variance — hence the median of
    several slope samples) is cancelled by differencing the two chain
    lengths.
    """
    import jax

    f = jax.jit(
        lambda x, m: jax.lax.fori_loop(0, m, lambda i, v: step(v), x)
    )

    def fetch_scalar(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return np.asarray(leaf).ravel()[0]

    def run(m):
        t0 = time.perf_counter()
        fetch_scalar(f(init, m))
        return time.perf_counter() - t0

    run(n1)  # compile before timing
    t1 = min(run(n1) for _ in range(samples))
    t2 = min(run(n2) for _ in range(samples))
    return (t2 - t1) / (n2 - n1) * 1e3


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
