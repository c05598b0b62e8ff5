"""Tracing / profiling utilities.

The reference has no built-in profiling (only ad-hoc cProfile artifacts,
SURVEY.md §5.1); the build standardizes on jax.profiler traces plus
lightweight wall-clock section timers whose report feeds the
<10-min-per-model acceptance target (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class Timer:
    """Named wall-clock section timers with a JSON-able report.

    ``block=True`` sections call ``jax.block_until_ready`` on a supplied
    value so async dispatch does not hide device time.
    """

    def __init__(self):
        self.sections: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.sections[name] = self.sections.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, value):
        """Record the time to materialize ``value`` under ``name``."""
        t0 = time.perf_counter()
        jax.block_until_ready(value)
        dt = time.perf_counter() - t0
        self.sections[name] = self.sections.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return value

    def report(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in sorted(self.sections.items(),
                                   key=lambda kv: -kv[1])}

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
