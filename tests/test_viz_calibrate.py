import numpy as np
import pandas as pd
import pytest
from scipy.special import softmax

from vsn_tpu.eval.calibrate_predictions import (
    extract_fold_from_filename,
    main as calib_main,
    process_all_folds,
    process_single_fold,
)
from vsn_tpu.viz.ci_studies import ci_vs_dataset_size, ci_vs_num_models, stratified_subset
from vsn_tpu.viz.ensemble import (
    analyze_run,
    ensemble_predictions,
    plot_confusion_matrix,
    plot_violin,
    summary_table,
)
from vsn_tpu.viz.instability import (
    aggregate_seed_metrics,
    instability_index,
    plot_seed_instability,
    t_confidence_interval,
)
from vsn_tpu.viz.stats import compute_pfo, mcnemar_test, wilcoxon_test


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------

def test_mcnemar_clear_winner():
    n = 300
    y = np.zeros(n, int)
    pred_a = np.zeros(n, int)          # A always right
    pred_b = np.zeros(n, int)
    pred_b[:60] = 1                    # B wrong on 60
    res = mcnemar_test(y, pred_a, pred_b)
    assert res["winner"] == "A"
    assert res["test_used"] == "mcnemar_chi2"
    assert res["contingency"]["A_correct_B_wrong"] == 60
    # cross-check against the textbook formula
    assert np.isclose(res["chi2_statistic"], (60 - 1) ** 2 / 60)


def test_mcnemar_small_sample_binomial():
    y = np.zeros(30, int)
    a = np.zeros(30, int)
    b = np.zeros(30, int)
    b[:5] = 1  # only 5 discordant
    with pytest.warns(UserWarning):
        res = mcnemar_test(y, a, b)
    assert res["test_used"] == "exact_binomial"
    # degenerate: identical models
    res2 = mcnemar_test(y, a, a)
    assert res2["p_value"] == 1.0 and res2["winner"] == "none"


def test_wilcoxon():
    rng = np.random.default_rng(0)
    a = rng.normal(0.8, 0.01, 10)
    b = a - 0.05  # A clearly better
    res = wilcoxon_test(a, b)
    assert res["winner"] == "A"
    assert res["p_value"] < 0.05
    res2 = wilcoxon_test(a, a + rng.normal(0, 1e-4, 10))
    assert res2["winner"] == "none"
    with pytest.raises(ValueError):
        wilcoxon_test(a, b[:5])


def test_pfo():
    rng = np.random.default_rng(0)
    sa = rng.normal(0.85, 0.01, 1000)
    sb = rng.normal(0.80, 0.01, 1000)
    res = compute_pfo(sa, sb)
    assert res["pfo_A_over_B"] < 0.01  # A robustly better
    assert res["pfo_B_over_A"] > 0.99
    # lower-is-better flips the delta
    res2 = compute_pfo(sa, sb, lower_is_better=True)
    assert res2["pfo_A_over_B"] > 0.99


# ---------------------------------------------------------------------------
# ensembling / viz
# ---------------------------------------------------------------------------

def make_pred_csv(path, seed, n=60, k=3, fold=0):
    rng = np.random.default_rng(seed)
    classes = ["CN", "AD", "FTD"][:k]
    gt = rng.integers(0, k, n)
    logits = rng.standard_normal((n, k)) + 2 * np.eye(k)[gt]
    probs = softmax(logits, axis=1)
    df = pd.DataFrame({
        "Subject": [f"sub-{i:03d}" for i in range(n)],
        "Diagnosis": [classes[g] for g in gt],
    })
    for i, c in enumerate(classes):
        df[f"pred_{c}"] = probs[:, i]
    df.to_csv(path, index=False)
    return df


def test_ensemble_and_analysis(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"prediction_model_run1_0_best{i}_id.csv"
        make_pred_csv(p, seed=i)
        paths.append(p)
    ens = ensemble_predictions(paths)
    pred_cols = [c for c in ens.columns if c.startswith("pred_")]
    # mean of the three
    manual = np.mean(
        [pd.read_csv(p)[pred_cols].to_numpy() for p in paths], axis=0
    )
    np.testing.assert_allclose(ens[pred_cols].to_numpy(), manual)

    res = analyze_run(paths, n_bootstrap=30)
    assert res["n_models"] == 3
    table = summary_table({"run1": res})
    assert "accuracy" in table.columns and len(table) == 1

    v = plot_violin({"run1": res}, "balanced_accuracy", tmp_path / "v.png")
    assert v.exists()
    c = plot_confusion_matrix(ens, tmp_path / "cm.png")
    assert c.exists()


# ---------------------------------------------------------------------------
# instability
# ---------------------------------------------------------------------------

def test_t_ci_and_aggregation():
    mean, lo, hi = t_confidence_interval([0.8, 0.82, 0.78, 0.81])
    assert lo < mean < hi
    from scipy import stats as st

    vals = np.array([0.8, 0.82, 0.78, 0.81])
    h = vals.std(ddof=1) / 2 * st.t.ppf(0.975, 3)
    assert np.isclose(hi - mean, h)

    per_seed = {"Swin": {0: 0.8, 1: 0.82, 2: 0.78},
                "ViT": {0: 0.7, 1: 0.9, 2: 0.5}}
    df = aggregate_seed_metrics(per_seed)
    assert len(df) == 2
    swin = df[df.architecture == "Swin"].iloc[0]
    vit = df[df.architecture == "ViT"].iloc[0]
    assert vit["std"] > swin["std"]
    inst = instability_index(per_seed, domain_size=100)
    assert inst.iloc[0]["architecture"] == "ViT"  # most unstable first
    assert "std_normalized" in inst.columns


def test_plot_seed_instability(tmp_path):
    per_seed = {"Swin": {0: 0.8, 1: 0.82}, "ViT": {0: 0.7, 1: 0.9}}
    p = plot_seed_instability(per_seed, "bacc", tmp_path / "seed.png")
    assert p.exists()


# ---------------------------------------------------------------------------
# CI studies
# ---------------------------------------------------------------------------

def test_stratified_subset():
    gt = np.array([0] * 80 + [1] * 20)
    rng = np.random.default_rng(0)
    idx = stratified_subset(gt, 50, rng)
    assert len(idx) == 50
    frac1 = (gt[idx] == 1).mean()
    assert 0.1 < frac1 < 0.3  # proportions roughly preserved


def test_ci_vs_dataset_size_shrinks():
    rng = np.random.default_rng(0)
    n, k = 400, 3
    gt = rng.integers(0, k, n)
    probs = softmax(rng.standard_normal((n, k)) + 1.5 * np.eye(k)[gt], axis=1)
    df = ci_vs_dataset_size(gt, probs, sizes=[50, 200], n_bootstrap=100,
                            n_repeats=2)
    w = df.groupby("size")["ci_width"].mean()
    assert w[200] < w[50]
    assert df.attrs["c_fit"] > 0


def test_ci_vs_num_models():
    rng = np.random.default_rng(0)
    n, k = 150, 3
    gt = rng.integers(0, k, n)
    sets = [softmax(rng.standard_normal((n, k)) + 1.5 * np.eye(k)[gt], axis=1)
            for _ in range(4)]
    df = ci_vs_num_models(sets, gt, n_bootstrap=50)
    assert list(df.n_models) == [1, 2, 3, 4]
    # ensembling more noisy-but-informative models should not hurt much
    assert df.iloc[-1]["mean"] >= df.iloc[0]["mean"] - 0.05


# ---------------------------------------------------------------------------
# calibrate_predictions pipeline
# ---------------------------------------------------------------------------

@pytest.fixture
def pred_dir(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    for fold in range(4):
        make_pred_csv(d / f"prediction_model_aaaa_{fold}_best0_id.csv",
                      seed=fold, fold=fold)
        make_pred_csv(d / f"prediction_model_aaaa_{fold}_best0_od.csv",
                      seed=10 + fold, fold=fold)
    return d


def test_extract_fold():
    assert extract_fold_from_filename(
        "prediction_model_59zznxlz_8_best0_id.csv"
    ) == 8
    assert extract_fold_from_filename("nonsense.csv") == -1


def test_single_fold_calibration(pred_dir, tmp_path):
    out = tmp_path / "calib"
    results = process_single_fold(pred_dir, out, val_fold=0,
                                  method="temperature")
    # 3 ID + 3 OD test folds (val fold skipped)
    assert len(results) == 6
    assert set(results.test_fold) == {1, 2, 3}
    assert (out / "prediction_model_aaaa_1_best0_id.csv").exists()
    assert not (out / "prediction_model_aaaa_0_best0_id.csv").exists()
    assert (out / "calibration_results.csv").exists()
    # calibrated probs still sum to 1
    df = pd.read_csv(out / "prediction_model_aaaa_1_best0_id.csv")
    probs = df[[c for c in df.columns if c.startswith("pred_")]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-6)


@pytest.mark.parametrize("method", ["temperature", "platt", "isotonic"])
def test_all_folds_with_ensemble(pred_dir, tmp_path, method):
    out = tmp_path / f"calib_{method}"
    results = process_all_folds(pred_dir, out, method=method)
    ens = results[results.val_fold == "ensemble"]
    assert set(ens.test_fold) == {0, 1, 2, 3}
    assert (out / "ensemble" / "prediction_model_aaaa_0_best0_id.csv").exists()
    assert (out / "all_folds_calibration_results.csv").exists()
    assert (out / "val_fold_0" / "prediction_model_aaaa_1_best0_id.csv").exists()


def test_calibrate_cli(pred_dir, tmp_path):
    res = calib_main([
        "--model-dir", str(pred_dir), "--output-dir", str(tmp_path / "o"),
        "--val-fold", "1", "--method", "temperature",
    ])
    assert len(res) == 6


def test_tta_vs_plain_study():
    from vsn_tpu.viz.ci_studies import tta_vs_plain_study

    rng = np.random.default_rng(0)
    n, k = 300, 3
    gt = rng.integers(0, k, n)
    plain = softmax(rng.standard_normal((n, k)) + 1.0 * np.eye(k)[gt], axis=1)
    tta = softmax(rng.standard_normal((n, k)) + 2.0 * np.eye(k)[gt], axis=1)
    df = tta_vs_plain_study(gt, plain, tta, sizes=[60, 150], n_bootstrap=60,
                            n_seeds=2)
    assert len(df) == 2 * 2 * 2  # seeds x sizes x variants
    m = df.groupby("variant")["mean"].mean()
    assert m["tta"] > m["plain"]  # the sharper predictor wins


def test_violin_cli(tmp_path):
    from vsn_tpu.viz.ensemble import main as violin_main

    d = tmp_path / "run_a"
    d.mkdir()
    for fold in range(2):
        for best in range(2):
            make_pred_csv(
                d / f"prediction_model_aa_{fold}_best{best}_id.csv",
                seed=fold * 10 + best,
            )
    out = tmp_path / "viz"
    res = violin_main([
        "--run", f"modelA={d}", "--output-dir", str(out),
        "--num-bootstrap", "30",
    ])
    assert (out / "summary.csv").exists()
    assert (out / "violin_balanced_accuracy.png").exists()
    assert (out / "confusion_modelA.png").exists()
    assert res["modelA"]["n_models"] == 4
