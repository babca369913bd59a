import numpy as np
import pytest
import sklearn.metrics as skm

from vsn_tpu.train import metrics as M


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    k = 4
    n = 300
    gt = rng.integers(0, k, n)
    logits = rng.standard_normal((n, k)) + 1.5 * np.eye(k)[gt]
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    return gt, probs, k


def test_accuracy_bacc_vs_sklearn(data):
    gt, probs, k = data
    pred = probs.argmax(1)
    assert np.isclose(M.accuracy(gt, pred), skm.accuracy_score(gt, pred))
    assert np.isclose(
        M.balanced_accuracy(gt, pred, k), skm.balanced_accuracy_score(gt, pred)
    )


def test_f1_vs_sklearn(data):
    gt, probs, k = data
    pred = probs.argmax(1)
    per, macro = M.f1_scores(gt, pred, k)
    np.testing.assert_allclose(
        per, skm.f1_score(gt, pred, average=None, zero_division=0), rtol=1e-10
    )
    assert np.isclose(macro, skm.f1_score(gt, pred, average="macro"))


def test_mcc_vs_sklearn(data):
    gt, probs, k = data
    pred = probs.argmax(1)
    assert np.isclose(M.mcc(gt, pred, k), skm.matthews_corrcoef(gt, pred))


def test_binary_aucs_vs_sklearn(data):
    gt, probs, k = data
    y = (gt == 1).astype(float)
    s = probs[:, 1]
    assert np.isclose(M.binary_roc_auc(y, s), skm.roc_auc_score(y, s), atol=1e-10)
    assert np.isclose(
        M.binary_pr_auc(y, s), skm.average_precision_score(y, s), atol=1e-10
    )


def test_binary_auc_with_ties():
    y = np.array([0, 0, 1, 1, 0, 1], float)
    s = np.array([0.2, 0.5, 0.5, 0.9, 0.5, 0.5])
    assert np.isclose(M.binary_roc_auc(y, s), skm.roc_auc_score(y, s), atol=1e-12)
    assert np.isclose(
        M.binary_pr_auc(y, s), skm.average_precision_score(y, s), atol=1e-12
    )


def test_ovr_auc_vs_sklearn(data):
    gt, probs, k = data
    ours = M.ovr_auc(gt, probs, "roc", "macro")
    theirs = skm.roc_auc_score(gt, probs, multi_class="ovr", average="macro")
    assert np.isclose(ours, theirs, atol=1e-10)
    ours_w = M.ovr_auc(gt, probs, "roc", "weighted")
    theirs_w = skm.roc_auc_score(gt, probs, multi_class="ovr", average="weighted")
    assert np.isclose(ours_w, theirs_w, atol=1e-10)


def test_absent_class_handling():
    gt = np.array([0, 0, 1, 1])  # class 2 absent
    probs = np.array(
        [[0.8, 0.1, 0.1], [0.7, 0.2, 0.1], [0.2, 0.7, 0.1], [0.1, 0.8, 0.1]]
    )
    out = M.compute_metrics(gt, probs, 3)
    assert np.isfinite(out["roc_auc"])
    assert out["acc"] == 1.0
    # bacc over present classes only
    assert out["bacc"] == 1.0


def test_nan_prob_fallback():
    gt = np.array([0, 1])
    probs = np.array([[np.nan, np.nan], [0.3, 0.7]])
    out = M.compute_metrics(gt, probs, 2)
    assert all(np.isfinite(v) for v in out.values())


def test_is_improvement():
    assert M.is_improvement("loss", 0.9, 1.0, 0.05)
    assert not M.is_improvement("loss", 0.99, 1.0, 0.05)
    assert M.is_improvement("bacc", 0.8, 0.7, 0.05)
    assert not M.is_improvement("bacc", 0.72, 0.7, 0.05)
