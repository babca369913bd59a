"""Lightweight hyperparameter search (TPE-style) — optuna replacement.

The reference uses Optuna's TPESampler (train/train_svm.py:181-334); optuna is
not in this environment, so this module provides a compatible micro-API:

    study = create_study(direction="maximize", seed=0)
    study.optimize(objective, n_trials=100)   # objective(trial) -> float

with ``trial.suggest_categorical / suggest_float(log=) / suggest_int``.

Sampler: the first ``n_startup`` trials are random; afterwards a
Tree-structured-Parzen-Estimator-style rule splits past trials into the top
gamma-quantile (good) and the rest (bad), fits Gaussian KDEs to each in the
(log-)transformed space, draws candidates from the good KDE and keeps the one
maximizing the density ratio l_good/l_bad. Categoricals use smoothed
frequency ratios. Falls back to optuna transparently when it is importable.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List

import numpy as np

try:  # pragma: no cover — optuna absent in this environment
    import optuna as _optuna
except ImportError:
    _optuna = None


class Trial:
    def __init__(self, study: "Study", params: Dict[str, Any]):
        self.study = study
        self._assigned = params
        self.params: Dict[str, Any] = {}

    def _get(self, name, default_sampler):
        if name in self._assigned:
            value = self._assigned[name]
        else:
            value = default_sampler()
        self.params[name] = value
        return value

    def suggest_categorical(self, name, choices):
        self.study._register(name, ("cat", tuple(choices)))
        return self._get(
            name, lambda: self.study.rng.choice(list(choices))
        )

    def suggest_float(self, name, low, high, log: bool = False):
        self.study._register(name, ("float", low, high, log))
        def rand():
            if log:
                return float(np.exp(self.study.rng.uniform(
                    math.log(low), math.log(high)
                )))
            return float(self.study.rng.uniform(low, high))
        return self._get(name, rand)

    def suggest_int(self, name, low, high):
        self.study._register(name, ("int", low, high))
        return self._get(
            name, lambda: int(self.study.rng.integers(low, high + 1))
        )


class Study:
    def __init__(self, direction: str = "maximize", seed: int | None = None,
                 n_startup: int = 10, gamma: float = 0.25,
                 n_candidates: int = 24):
        self.direction = direction
        self.rng = np.random.default_rng(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.trials: List[Dict] = []
        self.space: Dict[str, tuple] = {}
        self.best_value = None
        self.best_params: Dict[str, Any] | None = None

    def _register(self, name, spec):
        self.space.setdefault(name, spec)

    # ------------------------------------------------------------------ TPE
    def _split(self):
        values = np.array([t["value"] for t in self.trials])
        order = np.argsort(values)
        if self.direction == "maximize":
            order = order[::-1]
        n_good = max(1, int(np.ceil(self.gamma * len(order))))
        good = [self.trials[i] for i in order[:n_good]]
        bad = [self.trials[i] for i in order[n_good:]] or good
        return good, bad

    def _kde_logpdf(self, samples: np.ndarray, x: np.ndarray) -> np.ndarray:
        """1-D Gaussian KDE log-density with Silverman bandwidth."""
        n = len(samples)
        std = samples.std() if n > 1 else 1.0
        bw = max(1.06 * std * n ** (-0.2), 1e-3 * (abs(samples).mean() + 1e-9))
        d = (x[:, None] - samples[None, :]) / bw
        return np.log(
            np.exp(-0.5 * d**2).sum(axis=1) / (n * bw * np.sqrt(2 * np.pi))
            + 1e-300
        )

    def _sample_params(self) -> Dict[str, Any]:
        if len(self.trials) < self.n_startup or not self.space:
            return {}
        good, bad = self._split()
        params: Dict[str, Any] = {}
        for name, spec in self.space.items():
            kind = spec[0]
            gvals = [t["params"][name] for t in good if name in t["params"]]
            bvals = [t["params"][name] for t in bad if name in t["params"]]
            if not gvals:
                continue
            if kind == "cat":
                choices = spec[1]
                counts_g = np.array(
                    [1.0 + sum(v == c for v in gvals) for c in choices]
                )
                counts_b = np.array(
                    [1.0 + sum(v == c for v in bvals) for c in choices]
                )
                ratio = (counts_g / counts_g.sum()) / (counts_b / counts_b.sum())
                params[name] = choices[
                    int(self.rng.choice(len(choices), p=ratio / ratio.sum()))
                ]
            elif kind in ("float", "int"):
                low, high = spec[1], spec[2]
                log = kind == "float" and spec[3]
                tf = (lambda v: math.log(v)) if log else (lambda v: float(v))
                inv = (lambda v: float(np.exp(v))) if log else (lambda v: v)
                g = np.array([tf(v) for v in gvals])
                b = np.array([tf(v) for v in bvals]) if bvals else g
                # candidates from the good KDE (resample + jitter)
                idx = self.rng.integers(0, len(g), self.n_candidates)
                bw = max(g.std(), 1e-3 * (abs(g).mean() + 1e-9))
                cand = g[idx] + self.rng.normal(0, bw, self.n_candidates)
                cand = np.clip(cand, tf(low), tf(high))
                score = self._kde_logpdf(g, cand) - self._kde_logpdf(b, cand)
                best = inv(float(cand[int(np.argmax(score))]))
                params[name] = int(round(best)) if kind == "int" else best
                if kind == "int":
                    params[name] = int(np.clip(params[name], low, high))
        return params

    # -------------------------------------------------------------- driver
    def optimize(self, objective: Callable[[Trial], float], n_trials: int):
        for _ in range(n_trials):
            trial = Trial(self, self._sample_params())
            value = float(objective(trial))
            self.trials.append({"params": trial.params, "value": value})
            better = (
                self.best_value is None
                or (self.direction == "maximize" and value > self.best_value)
                or (self.direction == "minimize" and value < self.best_value)
            )
            if better:
                self.best_value = value
                self.best_params = dict(trial.params)
        return self

    @property
    def best_trial(self):
        return {"value": self.best_value, "params": self.best_params}


def create_study(direction: str = "maximize", seed: int | None = None,
                 use_optuna: bool = True):
    """Optuna study when available, otherwise the built-in TPE-style Study."""
    if use_optuna and _optuna is not None:  # pragma: no cover
        sampler = _optuna.samplers.TPESampler(seed=seed)
        return _optuna.create_study(direction=direction, sampler=sampler)
    return Study(direction=direction, seed=seed)
