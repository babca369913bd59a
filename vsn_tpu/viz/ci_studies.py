"""Confidence-interval scaling studies.

Parity with reference visualizations/ci_*.py + utils_ci.py:
  * CI width vs dataset size with the theoretical C/sqrt(n) fit
    (ci_bootstrap_vs_dataset_size.py:26-29);
  * CI width / performance vs number of ensembled models
    (ci_vs_number_of_models.py);
  * stratified subset generation preserving class proportions
    (utils_ci.py:91-113).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from vsn_tpu.eval.bootstrap import compute_bootstrap_metrics


def stratified_subset(gt: np.ndarray, size: int, rng: np.random.Generator):
    """Indices of a class-proportional subset of the given size."""
    gt = np.asarray(gt)
    classes, counts = np.unique(gt, return_counts=True)
    fractions = counts / counts.sum()
    idx = []
    for c, f in zip(classes, fractions):
        pool = np.flatnonzero(gt == c)
        k = max(1, int(round(size * f)))
        idx.append(rng.choice(pool, min(k, len(pool)), replace=False))
    idx = np.concatenate(idx)
    rng.shuffle(idx)
    return idx[:size]


def ci_vs_dataset_size(
    gt: np.ndarray,
    probs: np.ndarray,
    sizes: Sequence[int],
    metric: str = "balanced_accuracy",
    n_bootstrap: int = 1000,
    n_repeats: int = 3,
    seed: int = 0,
) -> pd.DataFrame:
    """Bootstrap-CI width per stratified subset size + C/sqrt(n) fit."""
    rng = np.random.default_rng(seed)
    rows = []
    for size in sizes:
        for rep in range(n_repeats):
            idx = stratified_subset(gt, size, rng)
            res = compute_bootstrap_metrics(
                gt[idx], probs[idx], n_bootstrap=n_bootstrap,
                random_state=seed + rep, keep_samples=False,
            )[metric]
            rows.append({
                "size": size, "repeat": rep, "mean": res["mean"],
                "ci_width": res["upper"] - res["lower"],
            })
    df = pd.DataFrame(rows)
    # least-squares fit of width = C / sqrt(n)
    w = df.groupby("size")["ci_width"].mean()
    n = w.index.to_numpy(np.float64)
    c_fit = float((w.to_numpy() * np.sqrt(n)).mean())
    df.attrs["c_fit"] = c_fit
    df["theoretical_width"] = c_fit / np.sqrt(df["size"])
    return df


def ci_vs_num_models(
    prediction_sets: Sequence[np.ndarray],
    gt: np.ndarray,
    metric: str = "balanced_accuracy",
    n_bootstrap: int = 1000,
    seed: int = 0,
) -> pd.DataFrame:
    """Ensemble performance/CI width as the snapshot count grows
    (per-subject prob mean over the first k model prediction arrays)."""
    rows = []
    for k in range(1, len(prediction_sets) + 1):
        probs = np.mean(prediction_sets[:k], axis=0)
        res = compute_bootstrap_metrics(
            gt, probs, n_bootstrap=n_bootstrap, random_state=seed,
            keep_samples=False,
        )[metric]
        rows.append({
            "n_models": k, "mean": res["mean"],
            "lower": res["lower"], "upper": res["upper"],
            "ci_width": res["upper"] - res["lower"],
        })
    return pd.DataFrame(rows)


def tta_vs_plain_study(
    gt: np.ndarray,
    probs_plain: np.ndarray,
    probs_tta: np.ndarray,
    sizes: Sequence[int],
    metric: str = "balanced_accuracy",
    n_bootstrap: int = 1000,
    n_seeds: int = 3,
    seed: int = 0,
) -> pd.DataFrame:
    """TTA-vs-no-TTA metric and CI width over stratified subsets and seeds
    (reference visualizations/ci_seeds_vs_dataset_size.py): for each subset
    size and seed, bootstrap both prediction sets on the SAME subjects."""
    rows = []
    for s in range(n_seeds):
        rng = np.random.default_rng(seed + s)
        for size in sizes:
            idx = stratified_subset(gt, size, rng)
            for name, probs in (("plain", probs_plain), ("tta", probs_tta)):
                res = compute_bootstrap_metrics(
                    gt[idx], probs[idx], n_bootstrap=n_bootstrap,
                    random_state=seed + s, keep_samples=False,
                )[metric]
                rows.append({
                    "seed": s, "size": size, "variant": name,
                    "mean": res["mean"],
                    "ci_width": res["upper"] - res["lower"],
                })
    return pd.DataFrame(rows)


def plot_ci_vs_size(df: pd.DataFrame, out_path, metric_name: str = "metric"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    g = df.groupby("size")["ci_width"].mean()
    ax.plot(g.index, g.values, "o-", label="measured")
    ax.plot(df["size"].unique(),
            df.attrs["c_fit"] / np.sqrt(np.sort(df["size"].unique())),
            "--", label=r"$C/\sqrt{n}$ fit")
    ax.set_xlabel("dataset size")
    ax.set_ylabel(f"95% CI width ({metric_name})")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
