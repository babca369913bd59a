"""Seed-instability analysis.

Parity with reference visualizations/visualize_intability_seeds.py: aggregate
per-seed metric results per architecture, report mean ± t-distribution 95% CI
(456-509) and std/CV instability measures (511+), optionally normalized by
evaluation-domain size.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd
from scipy import stats as st


def t_confidence_interval(values: Sequence[float], confidence: float = 0.95):
    """(mean, lower, upper) with Student-t critical values (small-n seeds)."""
    values = np.asarray(values, np.float64)
    values = values[~np.isnan(values)]
    n = len(values)
    mean = float(values.mean()) if n else np.nan
    if n < 2:
        return mean, np.nan, np.nan
    sem = values.std(ddof=1) / np.sqrt(n)
    h = sem * st.t.ppf(0.5 + confidence / 2, n - 1)
    return mean, float(mean - h), float(mean + h)


def aggregate_seed_metrics(
    per_seed: Dict[str, Dict[int, float]], confidence: float = 0.95
) -> pd.DataFrame:
    """per_seed: {architecture: {seed: metric_value}} -> summary rows."""
    rows = []
    for arch, seed_values in per_seed.items():
        vals = np.asarray(list(seed_values.values()), np.float64)
        mean, lo, hi = t_confidence_interval(vals, confidence)
        std = float(vals.std(ddof=1)) if len(vals) > 1 else np.nan
        rows.append({
            "architecture": arch,
            "n_seeds": len(vals),
            "mean": mean,
            "ci_lower": lo,
            "ci_upper": hi,
            "std": std,
            "cv": std / abs(mean) if mean not in (0.0, np.nan) else np.nan,
            "min": float(vals.min()),
            "max": float(vals.max()),
            "range": float(vals.max() - vals.min()),
        })
    return pd.DataFrame(rows)


def instability_index(
    per_seed: Dict[str, Dict[int, float]], domain_size: int | None = None
) -> pd.DataFrame:
    """Std/CV instability, optionally normalized by sqrt(domain size)
    (the reference's domain-size normalization, 966+)."""
    df = aggregate_seed_metrics(per_seed)
    if domain_size:
        df["std_normalized"] = df["std"] * np.sqrt(domain_size)
    return df.sort_values("std", ascending=False).reset_index(drop=True)


def plot_seed_instability(per_seed: Dict[str, Dict[int, float]], metric: str,
                          out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = aggregate_seed_metrics(per_seed)
    fig, ax = plt.subplots(figsize=(2 + 1.2 * len(df), 4))
    x = np.arange(len(df))
    yerr_lo = np.nan_to_num(df["mean"] - df["ci_lower"], nan=0.0)
    yerr_hi = np.nan_to_num(df["ci_upper"] - df["mean"], nan=0.0)
    ax.errorbar(x, df["mean"], yerr=[yerr_lo, yerr_hi], fmt="o", capsize=4)
    for arch, seeds in per_seed.items():
        i = list(per_seed).index(arch)
        ax.scatter([i] * len(seeds), list(seeds.values()), alpha=0.4, s=12)
    ax.set_xticks(x, df["architecture"], rotation=30, ha="right")
    ax.set_ylabel(metric)
    ax.set_title(f"{metric} across seeds (mean ± t-95% CI)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
