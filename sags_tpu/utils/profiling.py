"""Tracing/profiling as a first-class module (SURVEY.md §5: the reference has
only ad-hoc wall-clock timers — FPS counters in `python_tester/
gicp_odometry2.py:129-172`, chrono in `src/align.cpp:29-48`).

Two tools:
  * `PhaseTimer` — per-phase wall times with `block_until_ready` fencing
    (device-truthful, unlike async-dispatch timing).
  * `trace()` — context manager around `jax.profiler` emitting a TensorBoard
    trace directory.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


class PhaseTimer:
    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", result)
            if out is not None:
                jax.block_until_ready(out)
            self.times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.times[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "median_ms": float(np.median(v) * 1e3),
                "mean_ms": float(np.mean(v) * 1e3),
                "count": len(v),
            }
            for k, v in self.times.items()
        }

    def report(self) -> str:
        lines = [f"{k}: {s['median_ms']:.2f} ms (n={s['count']})"
                 for k, s in sorted(self.summary().items())]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sags_trace"):
    """jax.profiler trace around a block — open in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
