import json
import pickle

import numpy as np
import pandas as pd
import pytest

from vsn_tpu.data.synthetic import generate_synthetic_svm_dataset
from vsn_tpu.svm.evaluate import evaluate_pair, find_model_pairs
from vsn_tpu.svm.features import (
    N_FEATURES,
    SLANT_LABEL_IDS,
    DataPrepaSVM,
    average_by_structure,
    load_svm_features,
)
from vsn_tpu.svm.search import Study, create_study
from vsn_tpu.svm.train import compute_metric, train_single_fold, train_svm_search


@pytest.fixture(scope="module")
def svm_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("svm")
    raw, csvs = generate_synthetic_svm_dataset(
        root, n_subjects=60, shape=(12, 12, 12),
        diseases=("CN", "AD", "FTD"), kfold=10, seed=0,
    )
    return root, raw, csvs


def test_slant_label_table():
    assert N_FEATURES == 133
    assert SLANT_LABEL_IDS[0] == 0 and SLANT_LABEL_IDS[-1] == 207
    assert len(np.unique(SLANT_LABEL_IDS)) == 133


def test_average_by_structure(svm_data):
    root, raw, csvs = svm_data
    meta = pd.read_csv(csvs / "fold_0.csv").iloc[0]
    feats = average_by_structure(meta.Seg_path, meta.Mask_path)
    assert feats.shape == (133,)
    assert np.isclose(feats.sum(), 1.0)  # fractions over full mask sum to 1
    assert np.all(feats >= 0)


def test_feature_cache_and_load(svm_data, tmp_path):
    root, raw, csvs = svm_data
    meta = pd.concat([pd.read_csv(p) for p in sorted(csvs.glob("fold_*.csv"))])
    cache = tmp_path / "cache"
    prep = DataPrepaSVM(meta, cache)
    assert prep.preprocess_data() == 60
    assert prep.preprocess_data() == 0  # incremental
    X, Y = load_svm_features(cache, meta.reset_index(drop=True),
                             ["CN", "AD", "FTD"])
    assert X.shape == (60, 133) and Y.shape == (60,)
    assert set(Y) == {0, 1, 2}


def test_compute_metric_menu():
    y = np.array([0, 1, 2, 0, 1, 2])
    probs = np.eye(3)[y] * 0.8 + 0.1
    pred = probs.argmax(1)
    for m in ("bacc", "acc", "roc_auc", "mcc", "f1", "pr_auc", "precision",
              "recall", "neg_log_loss"):
        v = compute_metric(y, pred, probs, m)
        assert np.isfinite(v), m
    with pytest.raises(ValueError):
        compute_metric(y, pred, probs, "nope")


def test_tpe_study_beats_bad_region():
    """The TPE-ish sampler should concentrate samples near the optimum of a
    simple 1-D objective after startup trials."""

    def objective(trial):
        x = trial.suggest_float("x", 1e-3, 10.0, log=True)
        return -(np.log(x) - np.log(0.5)) ** 2  # max at x=0.5

    study = Study(direction="maximize", seed=0, n_startup=8)
    study.optimize(objective, n_trials=60)
    assert 0.1 < study.best_params["x"] < 2.5
    late = [t["params"]["x"] for t in study.trials[40:]]
    assert np.median(np.abs(np.log(late) - np.log(0.5))) < 1.5


def test_study_categorical_and_int():
    def objective(trial):
        k = trial.suggest_categorical("k", ["a", "b", "c"])
        d = trial.suggest_int("d", 2, 5)
        return (1.0 if k == "b" else 0.0) + d / 10

    study = create_study(direction="maximize", seed=1, use_optuna=False)
    study.optimize(objective, n_trials=40)
    assert study.best_params["k"] == "b"
    assert study.best_params["d"] >= 4  # drifts towards the top of the range
    late = [t["params"]["k"] for t in study.trials[25:]]
    assert late.count("b") > len(late) / 2


def test_svm_search_learns(svm_data, tmp_path):
    root, raw, csvs = svm_data
    meta = pd.concat(
        [pd.read_csv(p) for p in sorted(csvs.glob("fold_*.csv"))]
    ).reset_index(drop=True)
    cache = tmp_path / "cache"
    DataPrepaSVM(meta, cache).preprocess_data()
    X, Y = load_svm_features(cache, meta, ["CN", "AD", "FTD"])
    clf, scaler, params, score, trials = train_svm_search(
        X[:40], Y[:40], X[40:], Y[40:], n_trials=15, metric="bacc", seed=0
    )
    assert score > 0.5  # separable synthetic features
    assert params["kernel"] in ("linear", "rbf", "poly")
    assert len(trials) == 15


def test_train_single_fold_and_eval(svm_data, tmp_path):
    root, raw, csvs = svm_data
    save = tmp_path / "models"
    cache = tmp_path / "cache2"
    summary = train_single_fold(
        str(csvs), cache, save, fold=0, diseases=["CN", "AD", "FTD"],
        n_trials=8, metric="bacc", run_id="svmtest1",
    )
    assert summary["best_score"] > 0.4
    assert (save / "svm_svmtest1_0.pkl").exists()
    assert (save / "scaler_svmtest1_0.pkl").exists()
    imp = np.load(save / "importance_svmtest1_0.npy")
    assert imp.shape == (133,)

    pairs = find_model_pairs(save)
    assert ("svmtest1", 0) in pairs
    res = evaluate_pair(
        pairs[("svmtest1", 0)]["model"], pairs[("svmtest1", 0)]["scaler"],
        str(csvs), cache, tmp_path / "preds", fold=0,
        diseases=["CN", "AD", "FTD"], n_bootstrap=20, run_id="svmtest1",
    )
    assert "test_id" in res
    csv = tmp_path / "preds" / "prediction_svm_svmtest1_0_best0_id.csv"
    assert csv.exists()
    df = pd.read_csv(csv)
    probs = df[[c for c in df.columns if c.startswith("pred_")]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-6)
