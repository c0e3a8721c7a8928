"""Profiling and tracing hooks.

The reference has no profiling at all (SURVEY.md §5: "Tracing /
profiling: none"). This module provides:

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory;
- :class:`StepTimer`: wall-clock step timing with device-sync, running
  statistics and throughput;
- :func:`annotate`: named ``TraceAnnotation`` scope so pipeline stages
  show up in the profiler timeline.
"""

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace into ``logdir`` (view with TensorBoard's
    profile plugin or xprof)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named scope appearing in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with optional device synchronization.

    >>> timer = StepTimer(sync=True)
    >>> for batch in data:
    ...     with timer.step(items=len(batch)):
    ...         state, loss = train_step(state, *batch)
    >>> timer.summary()
    {'steps': N, 'mean_ms': ..., 'p50_ms': ..., 'items_per_sec': ...}
    """

    def __init__(self, sync=True, skip_first=1):
        self.sync = sync
        self.skip_first = skip_first
        self.times = []
        self.items = []
        self._result = None

    @contextlib.contextmanager
    def step(self, items=1, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            # Block on outstanding device work so the measurement covers
            # execution, not just dispatch.
            (jax.block_until_ready(result) if result is not None
             else jax.effects_barrier())
        self.times.append(time.perf_counter() - t0)
        self.items.append(items)

    def summary(self):
        times = self.times[self.skip_first:] or self.times
        items = self.items[self.skip_first:] or self.items
        if not times:
            return {"steps": 0}
        times_sorted = sorted(times)
        total = sum(times)
        return {
            "steps": len(times),
            "mean_ms": 1000 * total / len(times),
            "p50_ms": 1000 * times_sorted[len(times) // 2],
            "max_ms": 1000 * times_sorted[-1],
            "items_per_sec": sum(items) / total if total > 0 else 0.0,
        }

    def reset(self):
        self.times.clear()
        self.items.clear()
