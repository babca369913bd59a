"""SVM baseline trainer with hyperparameter search.

Parity with reference train/train_svm.py: per fold, fit a StandardScaler on
the train features, search SVC hyperparameters maximizing a chosen validation
metric — kernel in {linear, rbf, poly}, C ~ log-U(1e-4, 1), gamma ~
log-U(1e-5, 1e-1) for rbf/poly, degree in [2, 5] for poly, ovr decision
function, probability=True (train_svm.py:236-283) — keep the best model,
compute feature importance (|coef| for linear, permutation importance
otherwise, 135-179), and pickle model+scaler as ``svm_{runid}_{fold}.pkl`` /
``scaler_{runid}_{fold}.pkl`` (337-393).

The search uses vsn_tpu.svm.search (TPE-style; optuna when available).
"""

from __future__ import annotations

import argparse
import json
import pickle
import uuid
from pathlib import Path

import numpy as np
import pandas as pd

from vsn_tpu.data.folds import get_train_val_test
from vsn_tpu.svm.features import DataPrepaSVM, load_svm_features
from vsn_tpu.svm.search import create_study
from vsn_tpu.train import metrics as M


def compute_metric(y_true, y_pred, y_pred_prob, metric: str) -> float:
    """Validation metric menu (reference train_svm.py:103-131)."""
    k = y_pred_prob.shape[1]
    if metric == "bacc":
        return M.balanced_accuracy(y_true, y_pred, k)
    if metric == "acc":
        return M.accuracy(y_true, y_pred)
    if metric == "roc_auc":
        return M.ovr_auc(y_true, y_pred_prob, "roc", "macro")
    if metric == "pr_auc":
        return M.ovr_auc(y_true, y_pred_prob, "pr", "macro")
    if metric == "mcc":
        return M.mcc(y_true, y_pred, k)
    if metric == "f1":
        return M.f1_scores(y_true, y_pred, k)[1]
    if metric == "precision":
        prec = M.confusion_matrix(y_true, y_pred, k).astype(float)
        tp = np.diag(prec)
        denom = prec.sum(0)
        return float(np.divide(tp, denom, out=np.zeros_like(tp),
                               where=denom > 0).mean())
    if metric == "recall":
        cm = M.confusion_matrix(y_true, y_pred, k).astype(float)
        tp = np.diag(cm)
        denom = cm.sum(1)
        return float(np.divide(tp, denom, out=np.zeros_like(tp),
                               where=denom > 0).mean())
    if metric == "neg_log_loss":
        p = np.clip(y_pred_prob[np.arange(len(y_true)), y_true], 1e-12, 1)
        return float(np.log(p).mean())
    raise ValueError(f"unsupported metric {metric}")


def compute_feature_importance(classifier, scaler, X_val, Y_val,
                               n_repeats: int = 5, seed: int = 0):
    """|coef| for linear kernels; permutation importance otherwise
    (reference train_svm.py:135-179)."""
    if classifier.kernel == "linear":
        return np.abs(classifier.coef_).mean(axis=0)
    rng = np.random.default_rng(seed)
    Xs = scaler.transform(X_val)
    base = M.accuracy(Y_val, classifier.predict(Xs))
    importance = np.zeros(X_val.shape[1])
    for j in range(X_val.shape[1]):
        drops = []
        for _ in range(n_repeats):
            Xp = Xs.copy()
            Xp[:, j] = rng.permutation(Xp[:, j])
            drops.append(base - M.accuracy(Y_val, classifier.predict(Xp)))
        importance[j] = np.mean(drops)
    return importance


def train_svm_search(
    X_train, Y_train, X_val, Y_val,
    n_trials: int = 100,
    metric: str = "bacc",
    seed: int = 42,
):
    """Returns (best classifier, scaler, best params, best score, trials df)."""
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    scaler = StandardScaler().fit(X_train)
    Xt, Xv = scaler.transform(X_train), scaler.transform(X_val)

    best = {"score": -float("inf"), "clf": None, "params": None}

    def objective(trial):
        kernel = trial.suggest_categorical("kernel", ["linear", "rbf", "poly"])
        params = {
            "C": trial.suggest_float("C", 1e-4, 1.0, log=True),
            "kernel": kernel,
            "decision_function_shape": "ovr",
            "random_state": 42,
            "probability": True,
        }
        if kernel in ("rbf", "poly"):
            params["gamma"] = trial.suggest_float("gamma", 1e-5, 1e-1, log=True)
        if kernel == "poly":
            params["degree"] = trial.suggest_int("degree", 2, 5)
        clf = SVC(**params)
        clf.fit(Xt, Y_train)
        prob = clf.predict_proba(Xv)
        score = compute_metric(Y_val, prob.argmax(1), prob, metric)
        if score > best["score"]:
            best.update(score=score, clf=clf, params=dict(params))
        return score

    study = create_study(direction="maximize", seed=seed)
    study.optimize(objective, n_trials=n_trials)
    trials_df = pd.DataFrame(
        [{**t["params"], "value": t["value"]} for t in study.trials]
    ) if hasattr(study, "trials") and isinstance(study.trials, list) else None
    return best["clf"], scaler, best["params"], best["score"], trials_df


def train_single_fold(
    csv_dir, feature_cache_dir, save_dir, fold: int,
    diseases, kfold: int = 10, split=(7, 2, 1),
    n_trials: int = 100, metric: str = "bacc", run_id: str | None = None,
    metadata_all=None, seed: int = 42,
) -> dict:
    """Per-fold driver (reference train_svm.py:337-393)."""
    run_id = run_id or uuid.uuid4().hex[:8]
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    meta_train, meta_val, meta_test, meta_all = get_train_val_test(
        csv_dir, fold=fold, kfold=kfold, split=split
    )
    if metadata_all is not None:
        meta_all = metadata_all
    DataPrepaSVM(meta_all, feature_cache_dir).preprocess_data()

    meta_train = meta_train[meta_train.Diagnosis.isin(diseases)]
    meta_val = meta_val[meta_val.Diagnosis.isin(diseases)]
    X_train, Y_train = load_svm_features(feature_cache_dir, meta_train, diseases)
    X_val, Y_val = load_svm_features(feature_cache_dir, meta_val, diseases)

    clf, scaler, params, score, trials = train_svm_search(
        X_train, Y_train, X_val, Y_val, n_trials=n_trials, metric=metric,
        seed=seed,
    )
    importance = compute_feature_importance(clf, scaler, X_val, Y_val)

    with open(save_dir / f"svm_{run_id}_{fold}.pkl", "wb") as f:
        pickle.dump(clf, f)
    with open(save_dir / f"scaler_{run_id}_{fold}.pkl", "wb") as f:
        pickle.dump(scaler, f)
    np.save(save_dir / f"importance_{run_id}_{fold}.npy", importance)
    if trials is not None:
        trials.to_csv(save_dir / f"trials_{run_id}_{fold}.csv", index=False)
    summary = {
        "run_id": run_id, "fold": fold, "best_params": params,
        "best_score": score, "metric": metric,
        "n_train": len(X_train), "n_val": len(X_val),
    }
    with open(save_dir / f"svm_summary_{run_id}_{fold}.json", "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(description="vsn_tpu SVM trainer")
    p.add_argument("--training-csv-dir", required=True)
    p.add_argument("--intermediate-dir", required=True,
                   help="SLANT feature cache dir")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--kfold", type=int, default=10)
    p.add_argument("--diseases", nargs="+",
                   default=["CN", "AD", "PNFA", "BV", "SD"])
    p.add_argument("--n-trials", type=int, default=100)
    p.add_argument("--metric", default="bacc")
    p.add_argument("--runname", default=None)
    args = p.parse_args(argv)
    summary = train_single_fold(
        args.training_csv_dir, args.intermediate_dir, args.save_dir,
        fold=args.fold, diseases=args.diseases, kfold=args.kfold,
        n_trials=args.n_trials, metric=args.metric, run_id=args.runname,
    )
    print(json.dumps(summary, default=str))
    return summary


if __name__ == "__main__":
    main()
