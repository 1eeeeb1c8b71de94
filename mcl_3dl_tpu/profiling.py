"""Lightweight tracing/profiling.

The reference logs wall-clock spans around the measurement and map
updates ("MCL (%0.3f sec.)", src/mcl_3dl.cpp:361,827-829,1374-1376).
Here: a span registry with the same role, plus a helper to capture a
jax.profiler device trace around a callable for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class Spans:
    """Named wall-clock span accumulator."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def summary(self) -> List[str]:
        out = []
        for name in sorted(self.totals):
            n = self.counts[name]
            out.append(
                f"{name}: total {self.totals[name]:.3f}s over {n} "
                f"({self.totals[name] / n * 1e3:.2f} ms avg, "
                f"last {self.last[name] * 1e3:.2f} ms)"
            )
        return out


def trace_to(logdir: str, fn, *args, **kwargs):
    """Run ``fn`` under a jax.profiler trace written to ``logdir``."""
    import jax

    with jax.profiler.trace(logdir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out
