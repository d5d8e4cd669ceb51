"""Tracing / profiling (SURVEY.md §5): the reference had ad-hoc timing at
best; here `trace()` wraps any region in a jax.profiler trace viewable in
TensorBoard/Perfetto, and StepTimer produces the throughput numbers the
metrics writer logs (samples/sec/chip, frames/sec, realtime factor)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Profile a region: `with trace('/tmp/prof'): step(...)`."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput over a window of steps (blocking correct:
    call .tick() with the step's output array to include device time)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t = []

    def tick(self, out=None):
        if out is not None:
            jax.block_until_ready(out)
        self._t.append(time.perf_counter())
        if len(self._t) > self.window + 1:
            self._t.pop(0)

    def steps_per_sec(self) -> float:
        if len(self._t) < 2:
            return 0.0
        return (len(self._t) - 1) / (self._t[-1] - self._t[0])

    def throughput(self, units_per_step: float) -> float:
        return self.steps_per_sec() * units_per_step

    @staticmethod
    def realtime_factor(samples_per_sec: float,
                        sample_rate: int = 16_000) -> float:
        return samples_per_sec / sample_rate
