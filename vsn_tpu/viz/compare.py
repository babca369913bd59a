"""Architecture comparison driver.

CLI parity with reference visualizations/compare_architectures.py
(run_mcnemar_comparison:1402, run_wilcoxon_comparison:1521,
run_pfo_comparison:2300): given one prediction directory per architecture
(each holding ``prediction_*_{fold}_best*_id.csv`` files), produce

  * a ranking table (ensemble bootstrap mean ± CI per architecture);
  * pairwise McNemar matrix on pooled per-subject ensemble predictions;
  * pairwise Wilcoxon matrix over per-fold metric scores;
  * pairwise PFO matrix from pooled bootstrap samples.

Outputs CSVs + a JSON report into --output-dir.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

from vsn_tpu.eval.bootstrap import compute_bootstrap_metrics
from vsn_tpu.eval.calibrate_predictions import extract_fold_from_filename
from vsn_tpu.viz.ensemble import ensemble_predictions, predictions_to_arrays
from vsn_tpu.viz.stats import compute_pfo, mcnemar_test, wilcoxon_test


def load_architecture(pred_dir, pattern: str = "*_best*_id.csv"):
    """Per-fold snapshot-ensembled predictions pooled over folds.

    Returns dict with pooled df, per-fold dfs, gt, probs.
    """
    files = sorted(Path(pred_dir).glob(pattern))
    if not files:
        raise FileNotFoundError(f"no prediction CSVs in {pred_dir}")
    by_fold = defaultdict(list)
    for f in files:
        by_fold[extract_fold_from_filename(f)].append(f)
    fold_dfs = {
        fold: ensemble_predictions(paths) for fold, paths in by_fold.items()
    }
    pooled = pd.concat(fold_dfs.values(), ignore_index=True).sort_values(
        "Subject"
    ).reset_index(drop=True)
    gt, probs, classes = predictions_to_arrays(pooled)
    return {"pooled": pooled, "folds": fold_dfs, "gt": gt, "probs": probs,
            "classes": classes}


def _point_metric(gt, probs, metric: str) -> float:
    from vsn_tpu.train import metrics as M

    k = probs.shape[1]
    pred = probs.argmax(1)
    table = {
        "accuracy": lambda: M.accuracy(gt, pred),
        "balanced_accuracy": lambda: M.balanced_accuracy(gt, pred, k),
        "mcc": lambda: M.mcc(gt, pred, k),
        "macro_f1": lambda: M.f1_scores(gt, pred, k)[1],
        "roc_auc": lambda: M.ovr_auc(gt, probs, "roc", "weighted"),
        "pr_auc": lambda: M.ovr_auc(gt, probs, "pr", "weighted"),
    }
    return float(table[metric]())


def compare_architectures(
    arch_dirs: dict[str, str],
    metric: str = "balanced_accuracy",
    n_bootstrap: int = 2000,
    seed: int = 42,
):
    archs = {name: load_architecture(d) for name, d in arch_dirs.items()}
    names = list(archs)

    # cross-architecture subject alignment for McNemar
    common = set.intersection(
        *[set(a["pooled"].Subject) for a in archs.values()]
    )
    boot = {}
    fold_scores = {}
    for name, a in archs.items():
        boot[name] = compute_bootstrap_metrics(
            a["gt"], a["probs"], n_bootstrap=n_bootstrap, random_state=seed
        )
        scores = {}
        for fold, df in a["folds"].items():
            gt, probs, _ = predictions_to_arrays(df)
            scores[fold] = _point_metric(gt, probs, metric)
        fold_scores[name] = scores

    ranking = pd.DataFrame([
        {
            "architecture": n,
            "mean": boot[n][metric]["mean"],
            "lower": boot[n][metric]["lower"],
            "upper": boot[n][metric]["upper"],
            "n_subjects": len(archs[n]["pooled"]),
        }
        for n in names
    ]).sort_values("mean", ascending=False).reset_index(drop=True)

    mcnemar_rows, wilcoxon_rows, pfo_rows = [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            da = archs[a]["pooled"].set_index("Subject").loc[sorted(common)]
            db = archs[b]["pooled"].set_index("Subject").loc[sorted(common)]
            gt_a, pa, _ = predictions_to_arrays(da.reset_index())
            gt_b, pb, _ = predictions_to_arrays(db.reset_index())
            assert (gt_a == gt_b).all(), "ground truth mismatch across archs"
            m = mcnemar_test(gt_a, pa.argmax(1), pb.argmax(1))
            mcnemar_rows.append({"A": a, "B": b, **{
                k: v for k, v in m.items() if not isinstance(v, dict)
            }})
            folds = sorted(set(fold_scores[a]) & set(fold_scores[b]))
            if len(folds) >= 3:
                wres = wilcoxon_test(
                    np.array([fold_scores[a][f] for f in folds]),
                    np.array([fold_scores[b][f] for f in folds]),
                )
                wilcoxon_rows.append({"A": a, "B": b, **wres})
            p = compute_pfo(
                np.asarray(boot[a][metric]["samples"]),
                np.asarray(boot[b][metric]["samples"]),
            )
            pfo_rows.append({"A": a, "B": b, **{
                k: v for k, v in p.items() if np.isscalar(v)
            }})

    return {
        "ranking": ranking,
        "mcnemar": pd.DataFrame(mcnemar_rows),
        "wilcoxon": pd.DataFrame(wilcoxon_rows),
        "pfo": pd.DataFrame(pfo_rows),
        "fold_scores": fold_scores,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="compare architectures")
    p.add_argument("--arch", action="append", required=True,
                   help="NAME=prediction_dir (repeatable)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--metric", default="balanced_accuracy")
    p.add_argument("--num-bootstrap", type=int, default=2000)
    args = p.parse_args(argv)

    arch_dirs = dict(a.split("=", 1) for a in args.arch)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    res = compare_architectures(arch_dirs, metric=args.metric,
                                n_bootstrap=args.num_bootstrap)
    res["ranking"].to_csv(out / "ranking.csv", index=False)
    res["mcnemar"].to_csv(out / "mcnemar_pairwise.csv", index=False)
    if len(res["wilcoxon"]):
        res["wilcoxon"].to_csv(out / "wilcoxon_pairwise.csv", index=False)
    res["pfo"].to_csv(out / "pfo_pairwise.csv", index=False)
    with open(out / "report.json", "w") as f:
        json.dump({
            "ranking": res["ranking"].to_dict("records"),
            "fold_scores": res["fold_scores"],
        }, f, indent=2, default=float)
    print(res["ranking"].to_string(index=False))
    return res


if __name__ == "__main__":
    main()
