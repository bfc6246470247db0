"""Timing and profiling utilities.

The reference's observability is ad-hoc wall-clock prints (SURVEY.md §5:
std::chrono timers in test.cpp:125-130, Timer_lchf in forest.h:19-36,
time.time() deltas in the drivers).  Here: a stage timer with the same
spirit plus JAX profiler integration (Perfetto/TensorBoard traces).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulating wall-clock stage timer (Timer_lchf analog).

    >>> timer = StageTimer()
    >>> with timer("match"):
    ...     run_match()
    >>> timer.report()
    """

    def __init__(self, sync=None):
        """``sync``: optional callable run before each stop (e.g.
        ``jax.block_until_ready`` on outputs) so device work is counted."""
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync is not None and result is not None:
                self._sync(result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean_ms(self, name: str) -> float:
        return 1000.0 * self.totals[name] / max(self.counts.get(name, 0), 1)

    def report(self) -> str:
        lines = [
            f"{name:<24s} {self.mean_ms(name):9.3f} ms x {self.counts[name]}"
            for name in sorted(self.totals, key=lambda n: -self.totals[n])
        ]
        out = "\n".join(lines)
        print(out)
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """JAX profiler trace context (open with TensorBoard / Perfetto)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def block(tree):
    """Block until every array in a pytree is ready (for timing)."""
    import jax

    jax.block_until_ready(tree)
    return tree
