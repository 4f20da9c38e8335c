"""Tracing / profiling / progress utilities.

Upgrades the reference's wall-clock-only instrumentation (SURVEY.md
section 5: Timer in diffuser/utils/timer.py:3-12, Progress Hz readout in
progress.py:110-117, ad-hoc time.time() in eval.py:44-53) to:

- Timer: same contract as the reference's (elapsed since last call),
- StepTimer: steps/s with device synchronization (block_until_ready) so
  async dispatch can't fake throughput,
- trace(): context manager around jax.profiler for on-TPU traces viewable
  in TensorBoard/XProf,
- annotate(): named TraceAnnotation regions that show up inside device
  traces.
"""
from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Elapsed seconds since construction or last call (timer.py:3-12)."""

    def __init__(self):
        self._start = time.perf_counter()

    def __call__(self, reset: bool = True) -> float:
        now = time.perf_counter()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


class StepTimer:
    """Throughput with device sync: call tick(outputs) each step."""

    def __init__(self):
        self.count = 0
        self._t0 = None

    def tick(self, sync_value=None):
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        if self._t0 is None:
            self._t0 = time.perf_counter()  # first tick starts the clock
        else:
            self.count += 1
        return self.count

    @property
    def steps_per_s(self) -> float:
        if not self.count or self._t0 is None:
            return 0.0
        return self.count / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with trace("/tmp/profile"): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a device trace."""
    return jax.profiler.TraceAnnotation(name)


class ProgressMeter:
    """print-based progress line (diffuser/utils/progress.py analog)."""

    def __init__(self, total: int, every: int = 100, log_fn=print):
        self.total = total
        self.every = every
        self.log_fn = log_fn
        self.timer = Timer()
        self._seen = 0

    def update(self, **fields):
        self._seen += 1
        if self._seen % self.every == 0:
            rate = self.every / max(self.timer(), 1e-9)
            msg = " | ".join(f"{k}: {v}" for k, v in fields.items())
            self.log_fn(f"[{self._seen}/{self.total}] {msg} ({rate:.1f} it/s)")
