"""Tracing / profiling utilities.

The reference only has a wall-time print decorator (reference utils.py:79-97)
that is commented off the hot path (motion.py:108).  Here: the same decorator
(kept for API parity), `jax.named_scope` stage annotation, per-stage timing
accumulation for the results records, and an optional `jax.profiler` trace
directory for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from functools import wraps
from typing import Dict, Optional

import jax


def timer(func):
    """Wall-time print decorator (reference utils.py:79-97)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        ret = func(*args, **kwargs)
        end = time.perf_counter()
        print(f"Execution of '{func.__name__}' in {end - start:.3f}s")
        return ret

    return wrapper


class StageTimer:
    """Accumulates wall-time per named stage; results land in summary.json."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        with jax.named_scope(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def add(self, name: str, seconds: float, count: int = 1) -> None:
        """Account time measured elsewhere (e.g. on a background decode
        thread) under a named stage."""
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + count

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when a directory is given."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield
