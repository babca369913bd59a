"""Cumulative evaluation results table.

The reference maintains a deduplicated, sorted W&B table artifact
accumulating every checkpoint evaluation (eval/eval_transformer.py:789-1049).
This is the local-filesystem equivalent: aggregate ``metrics_*.json`` files
from eval output directories into one CSV, deduplicating by
(checkpoint, split) with newest-wins, sorted by (fold, checkpoint, split).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import pandas as pd

_METRICS = ("accuracy", "balanced_accuracy", "roc_auc", "pr_auc", "mcc",
            "macro_f1", "ece", "mce", "brier_score")


def collect_rows(metrics_dirs) -> pd.DataFrame:
    rows = []
    for d in metrics_dirs:
        for f in sorted(Path(d).glob("metrics_*.json")):
            data = json.loads(f.read_text())
            for split in ("val", "test_id", "test_od"):
                if split not in data:
                    continue
                row = {
                    "checkpoint": Path(data.get("checkpoint", f.stem)).stem,
                    "fold": data.get("fold"),
                    "split": split,
                    "use_tta": data.get("use_tta", False),
                    "model_index": data.get("model_index"),
                    "mtime": f.stat().st_mtime,
                    "source": str(f),
                }
                for m in _METRICS:
                    node = data[split].get(m)
                    if node:
                        row[m] = node["mean"]
                        row[f"{m}_lower"] = node["lower"]
                        row[f"{m}_upper"] = node["upper"]
                rows.append(row)
    if not rows:
        return pd.DataFrame()
    df = pd.DataFrame(rows)
    # dedup by (checkpoint, split): newest file wins (reference dedup,
    # eval_transformer.py:900-1010)
    df = df.sort_values("mtime").drop_duplicates(
        subset=["checkpoint", "split"], keep="last"
    )
    return df.sort_values(["fold", "checkpoint", "split"]).drop(
        columns=["mtime"]
    ).reset_index(drop=True)


def main(argv=None):
    p = argparse.ArgumentParser(description="aggregate eval metrics JSONs")
    p.add_argument("--metrics-dirs", nargs="+", required=True)
    p.add_argument("--output", required=True, help="output CSV path")
    args = p.parse_args(argv)
    df = collect_rows(args.metrics_dirs)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(args.output, index=False)
    print(f"{len(df)} rows -> {args.output}")
    return df


if __name__ == "__main__":
    main()
