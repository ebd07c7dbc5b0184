"""Profiling / tracing hooks.

The reference has only wall-clock logging (SURVEY §5); here profiling is
first-class: jax.profiler trace capture around training windows, a
per-step timing aggregator, and simple device-memory stats.

Usage:
    with trace_window(logdir, enabled=step in range(100, 110)):
        state, ... = train_step(...)
    timer = StepTimer(); timer.tick() each step; timer.summary()
"""
import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_window(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Online per-step wall-time stats with warmup skip."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self.best = float('inf')
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.n += 1
            if self.n > self.warmup:
                self.total += dt
                self.best = min(self.best, dt)
        self._last = now

    @property
    def mean(self) -> float:
        counted = max(1, self.n - self.warmup)
        return self.total / counted

    def summary(self, batch_size: Optional[int] = None) -> str:
        s = f'steps={self.n} mean={self.mean * 1e3:.2f}ms ' \
            f'best={self.best * 1e3:.2f}ms'
        if batch_size:
            s += f' throughput={batch_size / self.mean:.1f}/s'
        return s


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes), when the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
