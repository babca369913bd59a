"""Statistical tests for architecture comparison.

Parity with reference visualizations/compare_architectures.py:266-502:
  * McNemar's test on paired per-subject correctness — χ² with continuity
    correction, exact binomial when discordant pairs b+c < 25, degenerate
    p=1 when b+c = 0;
  * Wilcoxon signed-rank across folds (paired, non-parametric) with a
    Shapiro normality note and median/mean effect sizes;
  * PFO (probability of false outperformance, Christodoulou et al. 2025):
    fraction of paired bootstrap samples where the observed ranking reverses.
"""

from __future__ import annotations

import warnings
from typing import Dict

import numpy as np
from scipy.stats import binomtest, chi2, shapiro, wilcoxon


def mcnemar_test(y_true, y_pred_a, y_pred_b, alpha: float = 0.05) -> Dict:
    """Compare two classifiers on the same subjects via discordant pairs."""
    correct_a = np.asarray(y_pred_a) == np.asarray(y_true)
    correct_b = np.asarray(y_pred_b) == np.asarray(y_true)
    a = int((correct_a & correct_b).sum())
    b = int((correct_a & ~correct_b).sum())
    c = int((~correct_a & correct_b).sum())
    d = int((~correct_a & ~correct_b).sum())

    if b + c == 0:
        stat, p, used = 0.0, 1.0, "mcnemar_degenerate"
    elif b + c < 25:
        warnings.warn(
            f"low discordant pairs (b+c={b + c}); using exact binomial test"
        )
        stat = None
        p = binomtest(b, b + c, p=0.5, alternative="two-sided").pvalue
        used = "exact_binomial"
    else:
        stat = (abs(b - c) - 1) ** 2 / (b + c)
        p = float(1 - chi2.cdf(stat, df=1))
        used = "mcnemar_chi2"

    winner = "none" if p >= alpha else ("A" if b > c else "B")
    return {
        "chi2_statistic": None if stat is None else float(stat),
        "p_value": float(p),
        "winner": winner,
        "test_used": used,
        "contingency": {
            "both_correct": a, "A_correct_B_wrong": b,
            "A_wrong_B_correct": c, "both_wrong": d,
        },
        "n_samples": a + b + c + d,
    }


def wilcoxon_test(scores_a, scores_b, alternative: str = "two-sided",
                  alpha: float = 0.05) -> Dict:
    """Paired signed-rank test over per-fold scores."""
    scores_a = np.asarray(scores_a, np.float64)
    scores_b = np.asarray(scores_b, np.float64)
    if len(scores_a) != len(scores_b):
        raise ValueError("paired samples must have equal length")
    if len(scores_a) < 6:
        warnings.warn(f"wilcoxon with n={len(scores_a)} has low power")

    statistic, p_value = wilcoxon(scores_a, scores_b, alternative=alternative)
    diff = scores_a - scores_b
    normal_p = float(shapiro(diff).pvalue) if len(diff) >= 3 else np.nan
    median_diff = float(np.median(diff))
    if p_value < alpha:
        winner = "A" if median_diff > 0 else "B"
    else:
        winner = "none"
    return {
        "statistic": float(statistic),
        "p_value": float(p_value),
        "winner": winner,
        "median_difference": median_diff,
        "mean_difference": float(diff.mean()),
        "normality_p": normal_p,
        "n_folds": len(scores_a),
    }


def compute_pfo(samples_a, samples_b, lower_is_better: bool = False) -> Dict:
    """P(ranking reverses) from paired bootstrap metric samples."""
    samples_a = np.asarray(samples_a, np.float64)
    samples_b = np.asarray(samples_b, np.float64)
    if len(samples_a) != len(samples_b):
        raise ValueError("bootstrap sample counts must match")
    delta = (samples_b - samples_a) if lower_is_better else (samples_a - samples_b)
    return {
        "delta_observed": float(delta.mean()),
        "delta_std": float(delta.std()),
        "delta_ci95": (float(np.percentile(delta, 2.5)),
                       float(np.percentile(delta, 97.5))),
        "pfo_A_over_B": float((delta <= 0).mean()),
        "pfo_B_over_A": float((delta >= 0).mean()),
        "mean_A": float(samples_a.mean()),
        "mean_B": float(samples_b.mean()),
        "n_bootstrap": len(samples_a),
    }
