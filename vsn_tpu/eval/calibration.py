"""Post-hoc probability calibration.

Method parity with reference utils/calibration.py:9-267:
  * TemperatureScaling — Nelder-Mead NLL minimization over a scalar T applied
    to logits (29-111);
  * PlattScaling — per-class one-vs-rest logistic regression on the class
    logit, renormalized (114-191);
  * IsotonicCalibration — per-class isotonic regression on probabilities,
    renormalized (194-267).

All host-side (scipy/sklearn); calibration operates on saved prediction
arrays, never on the device hot path.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize
from scipy.special import softmax


class TemperatureScaling:
    """Scalar temperature fitted by Nelder-Mead on validation NLL."""

    def __init__(self):
        self.temperature = 1.0
        self.fitted = False

    def fit(self, logits: np.ndarray, labels: np.ndarray, verbose: bool = False):
        labels = np.asarray(labels).astype(np.int64)
        logits = np.asarray(logits, np.float64)

        def nll(t):
            t = t[0]
            if t <= 0:
                return 1e10
            p = softmax(logits / t, axis=1)
            p = np.clip(p, 1e-10, 1.0)
            return -np.mean(np.log(p[np.arange(len(labels)), labels]))

        result = minimize(nll, x0=[1.0], method="Nelder-Mead",
                          options={"maxiter": 1000})
        self.temperature = float(result.x[0])
        self.fitted = True
        if verbose:
            print(f"TemperatureScaling: T={self.temperature:.4f} "
                  f"NLL {nll([1.0]):.4f} -> {result.fun:.4f}")
        return self

    def transform(self, logits: np.ndarray) -> np.ndarray:
        t = self.temperature if self.fitted else 1.0
        return softmax(np.asarray(logits, np.float64) / t, axis=1)

    def fit_transform(self, logits, labels, verbose: bool = False):
        return self.fit(logits, labels, verbose).transform(logits)


class PlattScaling:
    """Per-class OVR logistic regression on the class logit."""

    def __init__(self):
        self.models = {}
        self.fitted = False

    def fit(self, logits: np.ndarray, labels: np.ndarray, verbose: bool = False):
        from sklearn.linear_model import LogisticRegression

        logits = np.asarray(logits, np.float64)
        labels = np.asarray(labels).astype(np.int64)
        for c in range(logits.shape[1]):
            model = LogisticRegression(solver="lbfgs", max_iter=1000)
            model.fit(logits[:, c].reshape(-1, 1), (labels == c).astype(int))
            self.models[c] = model
        self.fitted = True
        return self

    def transform(self, logits: np.ndarray) -> np.ndarray:
        if not self.fitted:
            raise ValueError("PlattScaling not fitted")
        logits = np.asarray(logits, np.float64)
        out = np.zeros_like(logits)
        for c, model in self.models.items():
            out[:, c] = model.predict_proba(logits[:, c].reshape(-1, 1))[:, 1]
        return out / out.sum(axis=1, keepdims=True)


class IsotonicCalibration:
    """Per-class isotonic regression on probabilities (not logits)."""

    def __init__(self):
        self.calibrators = {}
        self.fitted = False

    def fit(self, probs: np.ndarray, labels: np.ndarray, verbose: bool = False):
        from sklearn.isotonic import IsotonicRegression

        probs = np.asarray(probs, np.float64)
        labels = np.asarray(labels).astype(np.int64)
        for c in range(probs.shape[1]):
            cal = IsotonicRegression(out_of_bounds="clip")
            cal.fit(probs[:, c], (labels == c).astype(int))
            self.calibrators[c] = cal
        self.fitted = True
        return self

    def transform(self, probs: np.ndarray) -> np.ndarray:
        if not self.fitted:
            raise ValueError("IsotonicCalibration not fitted")
        probs = np.asarray(probs, np.float64)
        out = np.zeros_like(probs)
        for c, cal in self.calibrators.items():
            out[:, c] = cal.predict(probs[:, c])
        s = out.sum(axis=1, keepdims=True)
        s[s == 0] = 1.0
        return out / s


def make_calibrator(method: str):
    """'temperature' | 'platt' | 'isotonic' (reference
    utils/calibrate_predictions.py method flag)."""
    return {
        "temperature": TemperatureScaling,
        "platt": PlattScaling,
        "isotonic": IsotonicCalibration,
    }[method]()
