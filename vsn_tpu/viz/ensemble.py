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


# Paper figure styling (capability parity with reference
# visualizations/compute_metrics_plot_violin_csv.py:95, 250-420: whitegrid,
# percentage axes, CI whiskers + white mean diamonds + boxed labels on the
# violins, count+(percent) annotated Blues heatmaps, pastel pies).
_STYLE = "seaborn-v0_8-whitegrid"
_DOMAIN_COLORS = {"ID": "#9ecae1", "OD": "#fdbf6f"}
_HALF_OFFSET = 0.2


def _agg(plt):
    import matplotlib

    matplotlib.use("Agg")
    return plt


def _violin_ci_overlay(ax, x_pos, node, round_digits=1):
    """CI whisker + white mean diamond + boxed percentage label."""
    mean, lo, hi = (100 * node["mean"], 100 * node["lower"],
                    100 * node["upper"])
    if np.isnan(mean):
        return
    ax.vlines(x_pos, lo, hi, color="k", lw=2, zorder=10)
    ax.plot(x_pos, mean, "D", color="white", markersize=6,
            markeredgecolor="k", mew=1.5, zorder=11)
    ax.text(x_pos, mean + (hi - mean) * 0.5, f"{mean:.{round_digits}f}%",
            fontsize=9, ha="center", va="bottom", zorder=12,
            bbox=dict(boxstyle="round,pad=0.2", fc="white", ec="lightgray",
                      alpha=0.8))


def violin_axis(ax, results_by_cat: Dict[str, Dict], metric: str,
                results_by_cat_od: Dict[str, Dict] | None = None,
                round_digits: int = 1):
    """Styled violins of bootstrap samples (%), one category per x position;
    with an OD result set, split ID/OD half-violins per category."""
    import seaborn as sns

    rows = []
    names = list(results_by_cat)
    domains = [("ID", results_by_cat)]
    if results_by_cat_od is not None:
        domains.append(("OD", results_by_cat_od))
    for dom, res in domains:
        for name in names:
            node = res.get(name, {}).get("metrics", {}).get(metric)
            if node is None or node.get("samples") is None:
                continue
            s = 100 * np.asarray(node["samples"], np.float64)
            for v in s[~np.isnan(s)]:
                rows.append({"Value (%)": v, "Category": name,
                             "Domain": dom})
    if not rows:
        ax.text(0.5, 0.5, "No data for violins.", transform=ax.transAxes,
                ha="center", va="center")
        return
    df = pd.DataFrame(rows)
    split = results_by_cat_od is not None
    sns.violinplot(
        x="Category", y="Value (%)", hue="Domain", data=df, ax=ax,
        palette=_DOMAIN_COLORS, split=split, inner=None, cut=0,
        density_norm="width", hue_order=["ID", "OD"] if split else ["ID"],
        order=names, legend=split,
    )
    for x_idx, name in enumerate(names):
        for dom_idx, (dom, res) in enumerate(domains):
            node = res.get(name, {}).get("metrics", {}).get(metric)
            if node is None:
                continue
            x_pos = x_idx if not split else (
                x_idx - _HALF_OFFSET if dom_idx == 0 else x_idx + _HALF_OFFSET
            )
            _violin_ci_overlay(ax, x_pos, node, round_digits)
    if split and ax.get_legend():
        ax.legend(title="Domain", loc="best")
    ax.set_title(metric)


def plot_violin(results_by_run: Dict[str, Dict], metric: str, out_path,
                title: str | None = None,
                results_by_run_od: Dict[str, Dict] | None = None):
    """Paper-styled violin plot of bootstrap samples per run (optionally
    split ID/OD)."""
    import matplotlib.pyplot as plt

    _agg(plt)
    with plt.style.context(_STYLE):
        n = len(results_by_run)
        fig, ax = plt.subplots(
            figsize=(2.5 + 1.6 * n, 4.5), facecolor="white"
        )
        violin_axis(ax, results_by_run, metric, results_by_run_od)
        ax.set_xticks(range(n), list(results_by_run), rotation=30,
                      ha="right")
        ax.set_title(title or f"Bootstrap distribution of {metric}",
                     fontsize=13)
        fig.tight_layout()
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return out_path


def confusion_axis(ax, cm, classes, title, round_digits=1):
    """Annotated Blues heatmap: count + (row %) per cell (reference
    plot_confusion_matrix behavior)."""
    import seaborn as sns

    cm = np.asarray(cm, np.float64)
    norm = cm / np.maximum(cm.sum(1, keepdims=True), 1e-12)
    annot = np.empty_like(cm, dtype=object)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            annot[i, j] = f"{cm[i, j]:.{round_digits}f}\n({norm[i, j] * 100:.1f}%)"
    sns.heatmap(
        cm, annot=annot, fmt="", cmap="Blues", xticklabels=classes,
        yticklabels=classes, ax=ax, cbar=False,
        annot_kws={"size": 11 if len(classes) < 5 else 9},
        linewidths=1, linecolor="white",
    )
    ax.set_title(title, fontsize=14, pad=15)
    ax.set_xlabel("Predicted Label", fontsize=12)
    ax.set_ylabel("True Label", fontsize=12)
    ax.tick_params(length=0)


def plot_confusion_matrix(df: pd.DataFrame, out_path, normalize: bool = True,
                          title: str = "Confusion Matrix"):
    import matplotlib.pyplot as plt

    _agg(plt)
    from vsn_tpu.train.metrics import confusion_matrix

    gt, probs, classes = predictions_to_arrays(df)
    cm = confusion_matrix(gt, probs.argmax(1), len(classes)).astype(np.float64)
    with plt.style.context(_STYLE):
        fig, ax = plt.subplots(
            figsize=(1.6 + 1.1 * len(classes), 1.6 + 1.1 * len(classes)),
            facecolor="white",
        )
        confusion_axis(ax, cm, classes, title)
        fig.tight_layout()
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
    return out_path


def plot_dashboard(results_by_run: Dict[str, Dict], out_path,
                   results_by_run_od: Dict[str, Dict] | None = None,
                   metrics=("balanced_accuracy", "roc_auc", "macro_f1",
                            "ece"),
                   title: str | None = None):
    """Composite paper figure: metric violins, per-run confusion matrices,
    diagnosis-distribution pies, and a summary table (reference
    generate_visualizations:758-1090 layout)."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    _agg(plt)
    from vsn_tpu.train.metrics import confusion_matrix

    runs = list(results_by_run)
    n_runs = len(runs)
    with plt.style.context(_STYLE):
        fig = plt.figure(
            figsize=(6 + 5 * max(n_runs, 2), 16), facecolor="white"
        )
        gs = fig.add_gridspec(3, max(n_runs, 2), hspace=0.45, wspace=0.3)

        # row 0: one violin panel per metric (packed into the grid row)
        vax = fig.add_subplot(gs[0, :])
        rows = []
        for m in metrics:
            for dom, res in (
                [("ID", results_by_run)]
                + ([("OD", results_by_run_od)] if results_by_run_od else [])
            ):
                for run in runs:
                    node = res.get(run, {}).get("metrics", {}).get(m)
                    if node is None or node.get("samples") is None:
                        continue
                    s = 100 * np.asarray(node["samples"], np.float64)
                    for v in s[~np.isnan(s)]:
                        rows.append({"Value (%)": v, "Category": m,
                                     "Domain": dom})
        if rows:
            dfv = pd.DataFrame(rows)
            split = results_by_run_od is not None
            sns.violinplot(
                x="Category", y="Value (%)", hue="Domain", data=dfv, ax=vax,
                palette=_DOMAIN_COLORS, split=split, inner=None, cut=0,
                density_norm="width", order=list(metrics),
                hue_order=["ID", "OD"] if split else ["ID"],
            )
            for x_idx, m in enumerate(metrics):
                doms = [("ID", results_by_run)] + (
                    [("OD", results_by_run_od)] if results_by_run_od else []
                )
                for dom_idx, (dom, res) in enumerate(doms):
                    nodes = [
                        res.get(r, {}).get("metrics", {}).get(m)
                        for r in runs
                    ]
                    nodes = [nd for nd in nodes if nd is not None]
                    if not nodes:
                        continue
                    agg = {
                        "mean": float(np.mean([nd["mean"] for nd in nodes])),
                        "lower": float(np.mean([nd["lower"] for nd in nodes])),
                        "upper": float(np.mean([nd["upper"] for nd in nodes])),
                    }
                    x_pos = x_idx if not split else (
                        x_idx - _HALF_OFFSET if dom_idx == 0
                        else x_idx + _HALF_OFFSET
                    )
                    _violin_ci_overlay(vax, x_pos, agg)
            vax.set_title("Bootstrap metric distributions", fontsize=14)

        # row 1: confusion matrix per run (ID ensemble)
        for i, run in enumerate(runs[: gs.ncols]):
            ax = fig.add_subplot(gs[1, i])
            df = results_by_run[run]["ensemble"]
            gt, probs, classes = predictions_to_arrays(df)
            cm = confusion_matrix(gt, probs.argmax(1), len(classes))
            confusion_axis(ax, cm, classes, f"{run} (ID)", round_digits=0)

        # row 2: diagnosis pies + summary table
        pax = fig.add_subplot(gs[2, 0])
        df0 = results_by_run[runs[0]]["ensemble"]
        counts = df0["Diagnosis"].value_counts()
        colors = sns.color_palette("Pastel1", len(counts))

        def autopct(pct):
            val = int(round(pct * counts.sum() / 100.0))
            return f"{val}\n({pct:.1f}%)"

        pax.pie(counts.values, labels=counts.index, autopct=autopct,
                colors=colors, textprops={"fontsize": 10},
                wedgeprops={"linewidth": 1, "edgecolor": "white"})
        pax.set_title(f"Diagnosis distribution (n={counts.sum()})",
                      fontsize=12)

        tax = fig.add_subplot(gs[2, 1:]) if gs.ncols > 1 else None
        if tax is not None:
            tax.axis("off")
            tbl_df = summary_table(results_by_run, metric_names=metrics)
            cols = ["run"] + [
                c for m in metrics for c in (m, f"{m}_ci")
            ]
            cell = tbl_df[cols].round(3)
            table = tax.table(
                cellText=cell.values, colLabels=cell.columns,
                cellLoc="center", loc="center",
            )
            table.auto_set_font_size(False)
            table.set_fontsize(9)
            table.scale(1, 1.4)
            tax.set_title("Summary (mean [95% CI])", fontsize=12)

        if title:
            fig.suptitle(title, fontsize=17)
        fig.savefig(out_path, dpi=150, bbox_inches="tight")
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
    plot_dashboard(results, out / "dashboard.png",
                   metrics=tuple(args.metrics))
    table = summary_table(results, metric_names=tuple(args.metrics))
    table.to_csv(out / "summary.csv", index=False)
    print(table.to_string(index=False))
    return results


if __name__ == "__main__":
    main()
