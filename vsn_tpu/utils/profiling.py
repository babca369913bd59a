"""Profiling / step-timing instrumentation.

The reference ships none (SURVEY.md §5 — a gap, not parity): this module adds
``jax.profiler`` trace capture plus a lightweight step timer with percentile
summaries. The trainer wires both: ``train_fold(..., profile_dir=...)`` (CLI
``--profile-dir``) captures a device trace for a window of steps via
``StepTrace``, and a ``StepTimer`` always records per-step host dispatch
times, with percentiles emitted into the run's ``metrics.jsonl`` summary.

Dispatch-time caveat: the train step is dispatched asynchronously, so an
individual step's wall time measures host work until backpressure; once the
device queue is full (a few steps in), per-step dispatch time converges to
device step time, which is what the percentiles summarize (warmup skipped).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import numpy as np
import jax


@contextlib.contextmanager
def trace(profile_dir, enabled: bool = True):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    if not enabled or profile_dir is None:
        yield
        return
    Path(profile_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTrace:
    """Capture a jax.profiler trace for steps [start, start + n_steps).

    Call ``before_step(i)`` / ``after_step(i)`` around each training step
    with the 0-based loop index; trace start/stop happen at the window
    edges. No-op when ``profile_dir`` is None.
    """

    def __init__(self, profile_dir, start: int = 2, n_steps: int = 5):
        self.dir = str(profile_dir) if profile_dir else None
        self.start = int(start)
        self.stop_at = int(start) + int(n_steps)
        self._active = False

    def before_step(self, i: int):
        if self.dir and not self._active and i == self.start:
            Path(self.dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True

    def after_step(self, i: int):
        if self._active and i + 1 >= self.stop_at:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Wall-clock per-step timing with summary percentiles."""

    def __init__(self):
        self.durations: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self, skip_warmup: int = 1) -> dict:
        d = np.asarray(self.durations[skip_warmup:] or self.durations)
        if len(d) == 0:
            return {}
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "max_s": float(d.max()),
            "steps_per_sec": float(1.0 / d.mean()),
        }

    def save(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
