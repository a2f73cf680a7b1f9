"""Profiling hooks (SURVEY.md §5.1: the reference only has wall-clock timers
and call counters; here we expose jax.profiler traces + named step timers).

Usage:
    with trace_annotation('flow_train'):
        trainer.train(...)

    timer = StepTimer()
    with timer.time('mcmc'):
        ...
    timer.summary()  # {'mcmc': {'count': n, 'total_s': t, 'mean_s': m}}

To capture a full device trace viewable in TensorBoard/Perfetto:
    with device_trace('/tmp/jax-trace'):
        run(...)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def trace_annotation(name: str):
    """Named region in the device profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def device_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self):
        return {
            k: {'count': self._counts[k], 'total_s': self._totals[k],
                'mean_s': self._totals[k] / self._counts[k]}
            for k in self._totals
        }
