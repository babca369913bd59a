"""Experiment tracking: local JSONL/CSV logger with optional W&B passthrough.

The reference uses W&B as config registry, metric logger and artifact store
(SURVEY.md §5). Here the run directory is the source of truth (metrics.jsonl,
config.yaml, checkpoints); when the ``wandb`` package is importable and
``WANDB_MODE`` is not disabled, the same streams mirror to W&B.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

try:  # pragma: no cover — wandb absent in this environment
    import wandb as _wandb
except ImportError:
    _wandb = None


class Tracker:
    """Minimal run tracker: log(dict), summary, artifacts-as-files."""

    def __init__(self, run_dir, run_id: str, config: dict | None = None,
                 project: str = "vsn_tpu", use_wandb: bool | None = None,
                 filename: str = "events.jsonl"):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.run_id = run_id
        self._f = open(self.run_dir / filename, "a")
        self.summary: dict = {}
        self._wb = None
        if use_wandb is None:
            use_wandb = _wandb is not None and os.environ.get(
                "WANDB_MODE", ""
            ) != "disabled"
        if use_wandb and _wandb is not None:  # pragma: no cover
            self._wb = _wandb.init(project=project, id=run_id, resume="allow",
                                   config=config or {})

    def log(self, metrics: dict, step: int | None = None):
        row = {"_time": time.time(), **metrics}
        if step is not None:
            row["step"] = step
        self._f.write(json.dumps(row, default=float) + "\n")
        self._f.flush()
        if self._wb is not None:  # pragma: no cover
            self._wb.log(metrics, step=step)

    def set_summary(self, **kwargs):
        self.summary.update(kwargs)
        with open(self.run_dir / "summary.json", "w") as f:
            json.dump(self.summary, f, indent=2, default=float)
        if self._wb is not None:  # pragma: no cover
            for k, v in kwargs.items():
                self._wb.summary[k] = v

    def finish(self):
        if self.summary:
            # final summary also rides in the metric stream so a single
            # JSONL read gives the whole run (incl. step_time percentiles)
            self._f.write(
                json.dumps({"kind": "summary", **self.summary}, default=float)
                + "\n"
            )
        self._f.close()
        if self._wb is not None:  # pragma: no cover
            self._wb.finish()
