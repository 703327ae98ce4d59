"""Profiling hooks (SURVEY.md §5.1 — the reference has none; we ship them).

Wraps ``jax.profiler``: a context manager for ad-hoc traces and a step-window
tracer for training loops (trace steps [start, stop) into a TensorBoard
trace directory).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTracer:
    """Trace a window of training steps:
        tracer = StepTracer(logdir, start=10, stop=13)
        for step in ...: tracer.step(step)
    """

    def __init__(self, logdir: Optional[str], start: int, stop: int):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._active = False

    def step(self, step: int) -> None:
        if self.logdir is None:
            return
        if step == self.start and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Cheap rolling step timer for throughput logging."""

    def __init__(self, window: int = 50):
        self.window = window
        self.t0 = time.perf_counter()
        self.count = 0

    def tick(self) -> Optional[float]:
        self.count += 1
        if self.count % self.window == 0:
            dt = time.perf_counter() - self.t0
            self.t0 = time.perf_counter()
            return self.window / dt
        return None
