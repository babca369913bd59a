"""Snapshot ensembling + violin/summary analysis over prediction CSVs.

Parity with reference visualizations/compute_metrics_plot_violin_csv.py:
  * snapshot ensembling = per-subject mean of the ``pred_*`` columns across a
    run's best-N prediction CSVs (load_and_ensemble_data:106-232);
  * bootstrap metrics per run/fold; violin plots of the bootstrap samples;
    confusion matrices; mean±CI summary tables (calculate_metrics:650+,
    run_analysis:1045+).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np
import pandas as pd

from vsn_tpu.eval.bootstrap import compute_bootstrap_metrics


def ensemble_predictions(csv_paths: Sequence[str | Path]) -> pd.DataFrame:
    """Per-subject mean of pred_* columns across model checkpoints.

    All CSVs must cover the same subjects (the best-N snapshots of one run).
    """
    if not csv_paths:
        raise ValueError("no prediction CSVs given")
    frames = [pd.read_csv(p) for p in csv_paths]
    base = frames[0].sort_values("Subject").reset_index(drop=True)
    pred_cols = [c for c in base.columns if c.startswith("pred_")]
    stack = []
    for f in frames:
        f = f.sort_values("Subject").reset_index(drop=True)
        if not (f.Subject == base.Subject).all():
            raise ValueError("prediction CSVs cover different subjects")
        stack.append(f[pred_cols].to_numpy(np.float64))
    base[pred_cols] = np.mean(stack, axis=0)
    return base


def predictions_to_arrays(df: pd.DataFrame):
    """(gt indices, probs, class names) from a prediction dataframe."""
    pred_cols = [c for c in df.columns if c.startswith("pred_")]
    classes = [c.replace("pred_", "") for c in pred_cols]
    probs = df[pred_cols].to_numpy(np.float64)
    gt = df["Diagnosis"].map({c: i for i, c in enumerate(classes)}).to_numpy()
    return gt, probs, classes


def analyze_run(
    csv_paths: Sequence[str | Path],
    n_bootstrap: int = 10000,
    random_state: int = 42,
) -> Dict:
    """Ensemble the snapshots then bootstrap the ensemble's metrics."""
    df = ensemble_predictions(csv_paths)
    gt, probs, classes = predictions_to_arrays(df)
    metrics = compute_bootstrap_metrics(
        gt, probs, n_bootstrap=n_bootstrap, random_state=random_state
    )
    return {"ensemble": df, "metrics": metrics, "classes": classes,
            "n_models": len(csv_paths)}


def summary_table(results_by_run: Dict[str, Dict],
                  metric_names=("accuracy", "balanced_accuracy", "roc_auc",
                                "macro_f1", "mcc", "ece")) -> pd.DataFrame:
    """Mean [lower, upper] rows per run, one column per metric."""
    rows = []
    for run, res in results_by_run.items():
        row = {"run": run, "n_models": res["n_models"]}
        for m in metric_names:
            node = res["metrics"][m]
            row[m] = node["mean"]
            row[f"{m}_ci"] = f"[{node['lower']:.3f}, {node['upper']:.3f}]"
        rows.append(row)
    return pd.DataFrame(rows)


def plot_violin(results_by_run: Dict[str, Dict], metric: str, out_path,
                title: str | None = None):
    """Violin plot of bootstrap samples per run."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(results_by_run)
    data = [
        np.asarray(results_by_run[n]["metrics"][metric]["samples"], np.float64)
        for n in names
    ]
    data = [d[~np.isnan(d)] for d in data]
    fig, ax = plt.subplots(figsize=(2 + 1.2 * len(names), 4))
    ax.violinplot(data, showmeans=True)
    ax.set_xticks(range(1, len(names) + 1), names, rotation=30, ha="right")
    ax.set_ylabel(metric)
    ax.set_title(title or f"bootstrap distribution of {metric}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_confusion_matrix(df: pd.DataFrame, out_path, normalize: bool = True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vsn_tpu.train.metrics import confusion_matrix

    gt, probs, classes = predictions_to_arrays(df)
    cm = confusion_matrix(gt, probs.argmax(1), len(classes)).astype(np.float64)
    if normalize:
        cm = cm / np.maximum(cm.sum(1, keepdims=True), 1)
    fig, ax = plt.subplots(figsize=(1 + len(classes), 1 + len(classes)))
    im = ax.imshow(cm, cmap="Blues", vmin=0)
    ax.set_xticks(range(len(classes)), classes)
    ax.set_yticks(range(len(classes)), classes)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    for i in range(len(classes)):
        for j in range(len(classes)):
            ax.text(j, i, f"{cm[i, j]:.2f}", ha="center", va="center",
                    color="black" if cm[i, j] < 0.6 else "white")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    """CLI equivalent of reference visualizations/compute_metrics_plot_violin_
    csv.py: per run, snapshot-ensemble its best-N prediction CSVs, bootstrap
    the ensemble, and emit violin plots + confusion matrices + a summary
    table."""
    import argparse
    from collections import defaultdict

    from vsn_tpu.eval.calibrate_predictions import extract_fold_from_filename

    p = argparse.ArgumentParser(description="snapshot-ensemble analysis")
    p.add_argument("--run", action="append", required=True,
                   help="NAME=prediction_dir (repeatable)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--pattern", default="*_best*_id.csv")
    p.add_argument("--metrics", nargs="+",
                   default=["balanced_accuracy", "accuracy", "ece"])
    p.add_argument("--num-bootstrap", type=int, default=2000)
    args = p.parse_args(argv)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    results = {}
    for spec in args.run:
        name, d = spec.split("=", 1)
        files = sorted(Path(d).glob(args.pattern))
        if not files:
            raise FileNotFoundError(f"no prediction CSVs in {d}")
        by_fold = defaultdict(list)
        for f in files:
            by_fold[extract_fold_from_filename(f)].append(f)
        # ensemble per fold, pool subjects, analyze pooled
        pooled = pd.concat(
            [ensemble_predictions(fs) for fs in by_fold.values()],
            ignore_index=True,
        )
        gt, probs, classes = predictions_to_arrays(pooled)
        metrics = compute_bootstrap_metrics(
            gt, probs, n_bootstrap=args.num_bootstrap
        )
        results[name] = {"ensemble": pooled, "metrics": metrics,
                         "classes": classes,
                         "n_models": sum(len(v) for v in by_fold.values())}
        plot_confusion_matrix(pooled, out / f"confusion_{name}.png")

    for m in args.metrics:
        plot_violin(results, m, out / f"violin_{m}.png")
    table = summary_table(results, metric_names=tuple(args.metrics))
    table.to_csv(out / "summary.csv", index=False)
    print(table.to_string(index=False))
    return results


if __name__ == "__main__":
    main()
