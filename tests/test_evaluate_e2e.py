"""Train a tiny model then drive the eval pipeline on its checkpoints."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data.synthetic import generate_synthetic_dataset
from vsn_tpu.eval.evaluate import evaluate_checkpoint, main as eval_main
from vsn_tpu.train.trainer import train_fold


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("evale2e")
    raw, csvs = generate_synthetic_dataset(
        root, n_subjects=40, shape=(20, 24, 20), diseases=("CN", "AD", "FTD"),
        kfold=10, seed=2,
    )
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="ViT", IMG_SIZE=[16, 20, 16], RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4], EMBED_DIM=48, DEPTH=2, HEADS=2,
        DISEASES=["CN", "AD", "FTD"], BATCH_SIZE=1, EFFECTIVE_BATCH_SIZE=16,
        STEPS=12, LR_WARMUP=2, WD_WARMUP=2, LR_BASE=1e-3,
        VALIDATION_FREQUENCY=6, EARLY_STOPPING_PATIENCE=False, KEEP_BEST_N=2,
        SEED=11, FP16=False, STOCHASTIC_DEPTH_PROB=0.0,
    ))
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=root / "runs",
        cache_dir=root / "cache", run_id="evaltest",
    )
    return root, csvs, summary


def test_evaluate_checkpoint_plain(trained):
    root, csvs, summary = trained
    best0 = root / "runs" / "model_evaltest_0_best0.ckpt"
    out_dir = root / "preds"
    res = evaluate_checkpoint(
        best0, csv_dir=str(csvs), cache_dir=root / "cache",
        output_dir=out_dir, n_bootstrap=25,
    )
    assert res["fold"] == 0
    csv = out_dir / "prediction_model_evaltest_0_best0_id.csv"
    assert csv.exists()
    df = pd.read_csv(csv)
    assert {"pred_CN", "pred_AD", "pred_FTD", "Subject", "Diagnosis"} <= set(
        df.columns
    )
    probs = df[["pred_CN", "pred_AD", "pred_FTD"]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)

    mjson = json.load(open(out_dir / "metrics_model_evaltest_0_best0.json"))
    assert "val" in mjson and "test_id" in mjson
    assert 0 <= mjson["test_id"]["accuracy"]["mean"] <= 1
    assert mjson["test_id"]["ece"]["lower"] <= mjson["test_id"]["ece"]["upper"]

    # skip-if-exists
    res2 = evaluate_checkpoint(
        best0, csv_dir=str(csvs), cache_dir=root / "cache",
        output_dir=out_dir, n_bootstrap=25,
    )
    assert res2.get("skipped") is True


def test_evaluate_with_tta_and_od(trained):
    root, csvs, summary = trained
    best0 = root / "runs" / "model_evaltest_0_best0.ckpt"
    out_dir = root / "preds_tta"
    # use fold_5.csv as a stand-in OD cohort
    res = evaluate_checkpoint(
        best0, csv_dir=str(csvs), cache_dir=root / "cache",
        output_dir=out_dir, eval_csv=str(csvs / "fold_5.csv"),
        use_tta=True, n_bootstrap=10,
    )
    assert "test_od" in res
    assert (out_dir / "prediction_model_evaltest_0_best0_od.csv").exists()
    df = pd.read_csv(out_dir / "prediction_model_evaltest_0_best0_id.csv")
    probs = df[["pred_CN", "pred_AD", "pred_FTD"]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_eval_cli(trained, capsys):
    root, csvs, summary = trained
    last = root / "runs" / "model_evaltest_0_last.ckpt"
    eval_main([
        "--checkpoints", str(last),
        "--training-csv-dir", str(csvs),
        "--intermediate-dir", str(root / "cache"),
        "--output-dir", str(root / "preds_cli"),
        "--num-bootstrap", "10",
    ])
    assert (root / "preds_cli" / "prediction_model_evaltest_0_last_id.csv").exists()


def test_evaluator_resident_matches_plain(trained):
    """float16 device-resident eval must produce the identical probabilities
    as shipping the volumes (same bytes either way)."""
    from vsn_tpu.data.pipeline import InMemoryDataset
    from vsn_tpu.data.resident import build_resident
    from vsn_tpu.eval.evaluate import Evaluator, load_model_from_checkpoint

    root, csvs, summary = trained
    best0 = root / "runs" / "model_evaltest_0_best0.ckpt"
    cfg, model, variables, meta = load_model_from_checkpoint(best0)
    meta_df = pd.read_csv(csvs / "fold_1.csv")
    meta_df = meta_df[meta_df.Diagnosis.isin(cfg.DISEASES)].reset_index(drop=True)
    ds = InMemoryDataset(root / "cache", meta_df, list(cfg.DISEASES))

    ev = Evaluator(cfg, model)
    probs_plain, gt_plain = ev.predict_dataset(variables, ds)
    res = build_resident(ds.all_volumes(), "float16")
    probs_res, gt_res = ev.predict_dataset(variables, ds, res)
    np.testing.assert_array_equal(probs_plain, probs_res)
    np.testing.assert_array_equal(gt_plain, gt_res)


def test_filter_synthetic_and_dedup():
    from vsn_tpu.eval.evaluate import filter_synthetic, remove_duplicates

    df = pd.DataFrame({
        "Subject": ["sub-1", "sub-2_factor2", "sub-3", "sub-3"],
        "Diagnosis": ["CN", "AD", "FTD", "FTD"],
    })
    f = filter_synthetic(df)
    assert list(f.Subject) == ["sub-1", "sub-3", "sub-3"]
    d = remove_duplicates(f)
    assert list(d.Subject) == ["sub-1", "sub-3"]
    # missing Subject column passes through
    empty = pd.DataFrame({"a": [1]})
    assert filter_synthetic(empty).equals(empty)


def test_tta_batch_capped_at_flat_point(monkeypatch):
    """--use-tta caps the underlying batch (8x views: batch 64 = 512
    full-size dispatch rows, which failed to COMPILE at production
    geometry — BASELINE round 5). Explicit batch_size bypasses the cap."""
    import jax

    from vsn_tpu.eval.evaluate import Evaluator
    from vsn_tpu.models import build_model

    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="ViT", IMG_SIZE=[16, 20, 16], RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4], EMBED_DIM=48, DEPTH=1, HEADS=2,
        DISEASES=["CN", "AD"], BATCH_SIZE=4, EVAL_BATCH_SIZE=64,
    ))
    model = build_model(cfg)
    n_dev = len(jax.devices())
    plain = Evaluator(cfg, model, use_tta=False)
    tta = Evaluator(cfg, model, use_tta=True)
    explicit = Evaluator(cfg, model, use_tta=True, batch_size=32)
    assert plain.batch_size == 64
    assert tta.batch_size == max(8, n_dev)  # capped at VSN_TTA_BATCH=8
    assert explicit.batch_size == 32  # explicit wins over the cap
    monkeypatch.setenv("VSN_TTA_BATCH", "16")
    assert Evaluator(cfg, model, use_tta=True).batch_size == max(16, n_dev)
