"""Bootstrap confidence intervals for classification + calibration metrics.

Protocol parity with reference utils/bootstrap_metric.py:291-849
(compute_bootstrap_metrics): ``n_bootstrap`` seeded resamples with
class-presence retry (100 attempts) and a stratified fallback (362-406);
per-iteration metrics {accuracy, balanced_accuracy, weighted OVR ROC/PR-AUC
via label binarization, MCC, per-class precision/recall/F1, macro_f1/prec/
sens, ECE, MCE, Brier overall+per-class, softmax entropy, Gini, Rényi-2,
optional top-k family (480-552)}; aggregation to {mean, lower, upper,
samples} percentile CIs (714-849).

Performance: the reference pays joblib + sklearn per resample — minutes of
CPU per checkpoint. Here every metric is a handful of numpy kernels
(vsn_tpu/train/metrics.py, sklearn-verified), so 10k resamples run in
seconds on the host; no parallel backend needed.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Union

import numpy as np

from vsn_tpu.train import metrics as M


# ---------------------------------------------------------------------------
# Calibration / uncertainty kernels (reference bootstrap_metric.py:24-288)
# ---------------------------------------------------------------------------

def compute_ece(y_true, probs, correct_mask=None, n_bins: int = 15) -> float:
    """Expected calibration error over equal-width confidence bins
    ((lower, upper] binning like the reference)."""
    if correct_mask is None:
        correct_mask = probs.argmax(1) == y_true
    conf = probs.max(1)
    edges = np.linspace(0, 1, n_bins + 1)
    ece = 0.0
    n = len(conf)
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf <= hi)
        cnt = in_bin.sum()
        if cnt:
            acc = correct_mask[in_bin].mean()
            avg_conf = conf[in_bin].mean()
            ece += abs(avg_conf - acc) * cnt / n
    return float(ece)


def compute_mce(y_true, probs, correct_mask=None, n_bins: int = 15) -> float:
    if correct_mask is None:
        correct_mask = probs.argmax(1) == y_true
    conf = probs.max(1)
    edges = np.linspace(0, 1, n_bins + 1)
    mce = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf <= hi)
        if in_bin.sum():
            mce = max(mce, abs(conf[in_bin].mean() - correct_mask[in_bin].mean()))
    return float(mce)


def compute_brier(y_true, probs, n_classes, sample_mask=None):
    """(overall MSE, per-class dict); masked variant for top-k."""
    if sample_mask is not None:
        y_true, probs = y_true[sample_mask], probs[sample_mask]
    if len(y_true) == 0:
        return np.nan, {c: np.nan for c in range(n_classes)}
    onehot = np.zeros((len(y_true), n_classes))
    onehot[np.arange(len(y_true)), y_true] = 1.0
    per_class = ((probs - onehot) ** 2).mean(0)
    return float(per_class.mean()), {c: float(per_class[c]) for c in range(n_classes)}


def softmax_entropy(probs, sample_mask=None) -> float:
    if sample_mask is not None:
        probs = probs[sample_mask]
    if len(probs) == 0:
        return np.nan
    return float((-(probs * np.log(probs + 1e-10)).sum(1)).mean())


def gini_index(probs, sample_mask=None) -> float:
    if sample_mask is not None:
        probs = probs[sample_mask]
    if len(probs) == 0:
        return np.nan
    return float((1.0 - (probs**2).sum(1)).mean())


def renyi_entropy(probs, alpha: float = 2.0, sample_mask=None) -> float:
    if alpha <= 0 or alpha == 1:
        raise ValueError("alpha must be positive and != 1")
    if sample_mask is not None:
        probs = probs[sample_mask]
    if len(probs) == 0:
        return np.nan
    s = (probs**alpha).sum(1)
    return float(((1.0 / (1.0 - alpha)) * np.log(s + 1e-10)).mean())


# ---------------------------------------------------------------------------
# Per-resample metric bundle
# ---------------------------------------------------------------------------

def _precision_recall_f1(gt, pred, n_classes):
    cm = M.confusion_matrix(gt, pred, n_classes).astype(np.float64)
    tp = np.diag(cm)
    denom_p = cm.sum(0)
    denom_r = cm.sum(1)
    prec = np.divide(tp, denom_p, out=np.zeros_like(tp), where=denom_p > 0)
    rec = np.divide(tp, denom_r, out=np.zeros_like(tp), where=denom_r > 0)
    denom_f = prec + rec
    f1 = np.divide(2 * prec * rec, denom_f, out=np.zeros_like(tp), where=denom_f > 0)
    return prec, rec, f1


def _iteration_metrics(gt, pred, probs, n_classes, top_ns):
    prec, rec, f1 = _precision_recall_f1(gt, pred, n_classes)
    brier_overall, brier_class = compute_brier(gt, probs, n_classes)
    out = {
        "accuracy": M.accuracy(gt, pred),
        "balanced_accuracy": M.balanced_accuracy(gt, pred, n_classes),
        "roc_auc": M.ovr_auc(gt, probs, "roc", "weighted"),
        "pr_auc": M.ovr_auc(gt, probs, "pr", "weighted"),
        "mcc": M.mcc(gt, pred, n_classes),
        "macro_f1": float(f1.mean()),
        "macro_prec": float(prec.mean()),
        "macro_sens": float(rec.mean()),
        "ece": compute_ece(gt, probs),
        "mce": compute_mce(gt, probs),
        "brier_score": brier_overall,
        "softmax_entropy": softmax_entropy(probs),
        "gini": gini_index(probs),
        "renyi": renyi_entropy(probs, 2.0),
        "precision": {c: float(prec[c]) for c in range(n_classes)},
        "recall": {c: float(rec[c]) for c in range(n_classes)},
        "f1": {c: float(f1[c]) for c in range(n_classes)},
        "brier_class": brier_class,
    }
    for k in top_ns:
        topk = np.argsort(probs, axis=1)[:, -k:]
        correct = (topk == gt[:, None]).any(1)
        out[f"top_{k}_accuracy"] = float(correct.mean())
        out[f"top_{k}_ece"] = compute_ece(gt, probs, correct_mask=correct)
        out[f"top_{k}_mce"] = compute_mce(gt, probs, correct_mask=correct)
        bo, bc = compute_brier(gt, probs, n_classes, sample_mask=correct)
        out[f"top_{k}_brier_score"] = bo
        out[f"top_{k}_brier_class"] = bc
        out[f"top_{k}_softmax_entropy"] = softmax_entropy(probs, correct)
        out[f"top_{k}_gini"] = gini_index(probs, correct)
        out[f"top_{k}_renyi"] = renyi_entropy(probs, 2.0, correct)
        p_d, r_d, f_d, recalls = {}, {}, {}, []
        for c in range(n_classes):
            mask_c = gt == c
            if mask_c.any():
                r = float(correct[mask_c].mean())
                recalls.append(r)
                appears = (topk == c).any(1)
                pp = appears.sum()
                p = float((appears & mask_c).sum() / pp) if pp else 0.0
                p_d[c], r_d[c] = p, r
                f_d[c] = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
            else:
                p_d[c] = r_d[c] = f_d[c] = 0.0
        if recalls:
            out[f"top_{k}_balanced_accuracy"] = float(np.mean(recalls))
        else:
            out[f"top_{k}_balanced_accuracy"] = np.nan
        out[f"top_{k}_precision"], out[f"top_{k}_recall"] = p_d, r_d
        out[f"top_{k}_f1"] = f_d
        vals = lambda d: [d[c] for c in range(n_classes)]
        out[f"top_{k}_macro_f1"] = float(np.mean(vals(f_d)))
        out[f"top_{k}_macro_prec"] = float(np.mean(vals(p_d)))
        out[f"top_{k}_macro_sens"] = float(np.mean(vals(r_d)))
    return out


def _resample_indices(rng, y_true, classes, n_samples, max_attempts=100):
    """Resample with class-presence retry + stratified fallback
    (reference 362-406)."""
    for _ in range(max_attempts):
        idx = rng.integers(0, n_samples, n_samples)
        if len(np.unique(y_true[idx])) == len(classes):
            return idx
    # stratified fallback: proportional per-class draws, pad/trim to n
    parts = []
    for c in classes:
        pool = np.flatnonzero(y_true == c)
        k = max(1, int(len(pool)))
        parts.append(rng.choice(pool, k, replace=True))
    idx = np.concatenate(parts)
    rng.shuffle(idx)
    if len(idx) > n_samples:
        return idx[:n_samples]
    extra = rng.integers(0, n_samples, n_samples - len(idx))
    return np.concatenate([idx, extra])


def compute_bootstrap_metrics(
    y_true: np.ndarray,
    y_pred_probs: np.ndarray,
    n_bootstrap: int = 10000,
    confidence: float = 0.95,
    random_state: int = 42,
    top_n: Union[int, Iterable[int], None] = None,
    keep_samples: bool = True,
) -> Dict:
    """Percentile-CI bootstrap over the full metric bundle.

    Returns {metric: {mean, lower, upper, samples}} with per-class metrics as
    {metric: {class_idx: {...}}} — the reference's output schema.
    """
    y_true = np.asarray(y_true).astype(int)
    y_pred_probs = np.asarray(y_pred_probs, np.float64)
    n_samples = len(y_true)
    n_classes = y_pred_probs.shape[1]
    classes = np.unique(y_true)

    top_ns: List[int] = []
    if top_n is not None:
        top_ns = sorted({int(top_n)} if isinstance(top_n, int) else
                        {int(k) for k in top_n})
        for k in top_ns:
            if k < 1 or k > n_classes:
                raise ValueError(f"top-n {k} must be in [1, {n_classes}]")

    pred_all = y_pred_probs.argmax(1)
    rows = []
    for i in range(n_bootstrap):
        rng = np.random.default_rng((random_state + i) % (2**32))
        idx = _resample_indices(rng, y_true, classes, n_samples)
        rows.append(
            _iteration_metrics(
                y_true[idx], pred_all[idx], y_pred_probs[idx], n_classes, top_ns
            )
        )

    alpha = (1 - confidence) / 2

    def ci(values):
        values = np.asarray(values, np.float64)
        valid = values[~np.isnan(values)]
        if len(valid) == 0:
            return dict(mean=np.nan, lower=np.nan, upper=np.nan,
                        samples=values if keep_samples else None)
        return dict(
            mean=float(valid.mean()),
            lower=float(np.percentile(valid, 100 * alpha)),
            upper=float(np.percentile(valid, 100 * (1 - alpha))),
            samples=values if keep_samples else None,
        )

    scalar_keys = [k for k, v in rows[0].items() if not isinstance(v, dict)]
    class_keys = [k for k, v in rows[0].items() if isinstance(v, dict)]
    out = {}
    for k in scalar_keys:
        out[k] = ci([r[k] for r in rows])
    for k in class_keys:
        out[k] = {
            c: ci([r[k][c] for r in rows]) for c in range(n_classes)
        }
    return out
