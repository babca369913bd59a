"""Profiling / step-timing instrumentation.

The reference ships none (SURVEY.md §5 — a gap, not parity): this module adds
``jax.profiler`` trace capture plus a lightweight step timer with percentile
summaries, wired into the trainer via ``profile_dir``.
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
