"""SVM baseline evaluation.

Parity with reference eval/eval_svm.py: discover svm/scaler pickle pairs by
filename regex ``svm_{runid}_{fold}.pkl`` / ``scaler_{runid}_{fold}.pkl``
(find_model_pairs:64-112), evaluate ID (fold test split) and optional OD
cohorts with bootstrap metrics incl. ECE/MCE/Brier, and write prediction CSVs
(run_evaluation:214-293).
"""

from __future__ import annotations

import argparse
import json
import pickle
import re
from pathlib import Path

import numpy as np

from vsn_tpu.data.folds import get_train_val_test, load_metadata
from vsn_tpu.eval.evaluate import _bootstrap_summary, attach_predictions
from vsn_tpu.svm.features import DataPrepaSVM, load_svm_features


def find_model_pairs(model_dir) -> dict:
    """{(run_id, fold): {"model": path, "scaler": path}}"""
    model_dir = Path(model_dir)
    pairs = {}
    for f in model_dir.glob("svm_*_*.pkl"):
        m = re.fullmatch(r"svm_([A-Za-z0-9]+)_(\d+)\.pkl", f.name)
        if not m:
            continue
        run_id, fold = m.group(1), int(m.group(2))
        scaler = model_dir / f"scaler_{run_id}_{fold}.pkl"
        if scaler.exists():
            pairs[(run_id, fold)] = {"model": f, "scaler": scaler}
    return pairs


def predict(model, scaler, X, n_classes: int | None = None):
    """predict_proba expanded to the full class count: an SVC fitted on a
    subset of the diseases (e.g. a cohort missing a class) reports
    probabilities only for ``model.classes_`` — scatter them into the full
    [N, n_classes] matrix."""
    probs = model.predict_proba(scaler.transform(X))
    if n_classes is None or probs.shape[1] == n_classes:
        return probs
    full = np.zeros((len(probs), n_classes))
    full[:, np.asarray(model.classes_, int)] = probs
    return full


def evaluate_pair(
    model_path, scaler_path, csv_dir, feature_cache_dir, output_dir,
    fold: int, diseases, kfold: int = 10, split=(7, 2, 1),
    eval_csv=None, n_bootstrap: int = 10000, run_id: str = "run",
) -> dict:
    with open(model_path, "rb") as f:
        model = pickle.load(f)
    with open(scaler_path, "rb") as f:
        scaler = pickle.load(f)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    _, _, meta_test, meta_all = get_train_val_test(
        csv_dir, fold=fold, kfold=kfold, split=split
    )
    DataPrepaSVM(meta_all, feature_cache_dir).preprocess_data()
    meta_test = meta_test[meta_test.Diagnosis.isin(diseases)].reset_index(
        drop=True
    )
    X, Y = load_svm_features(feature_cache_dir, meta_test, diseases)
    probs = predict(model, scaler, X, n_classes=len(diseases))
    results = {
        "run_id": run_id, "fold": fold,
        "test_id": _bootstrap_summary(
            probs, np.eye(len(diseases))[Y], n_bootstrap
        ),
    }
    attach_predictions(meta_test, probs, diseases).to_csv(
        output_dir / f"prediction_svm_{run_id}_{fold}_best0_id.csv", index=False
    )

    if eval_csv is not None:
        meta_od = load_metadata(eval_csv)
        meta_od = meta_od[meta_od.Diagnosis.isin(diseases)].reset_index(
            drop=True
        )
        DataPrepaSVM(meta_od, feature_cache_dir).preprocess_data()
        X_od, Y_od = load_svm_features(feature_cache_dir, meta_od, diseases)
        probs_od = predict(model, scaler, X_od, n_classes=len(diseases))
        results["test_od"] = _bootstrap_summary(
            probs_od, np.eye(len(diseases))[Y_od], n_bootstrap
        )
        attach_predictions(meta_od, probs_od, diseases).to_csv(
            output_dir / f"prediction_svm_{run_id}_{fold}_best0_od.csv",
            index=False,
        )

    with open(output_dir / f"metrics_svm_{run_id}_{fold}.json", "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="vsn_tpu SVM evaluator")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--training-csv-dir", required=True)
    p.add_argument("--intermediate-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--eval-csv", default=None)
    p.add_argument("--diseases", nargs="+",
                   default=["CN", "AD", "PNFA", "BV", "SD"])
    p.add_argument("--kfold", type=int, default=10)
    p.add_argument("--num-bootstrap", type=int, default=10000)
    args = p.parse_args(argv)

    pairs = find_model_pairs(args.model_dir)
    if not pairs:
        raise FileNotFoundError(f"no svm/scaler pairs in {args.model_dir}")
    out = []
    for (run_id, fold), paths in sorted(pairs.items()):
        out.append(evaluate_pair(
            paths["model"], paths["scaler"], args.training_csv_dir,
            args.intermediate_dir, args.output_dir, fold=fold,
            diseases=args.diseases, kfold=args.kfold, eval_csv=args.eval_csv,
            n_bootstrap=args.num_bootstrap, run_id=run_id,
        ))
    print(json.dumps(
        [{k: v for k, v in r.items() if not isinstance(v, dict)} for r in out]
    ))
    return out


if __name__ == "__main__":
    main()
