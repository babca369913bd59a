"""End-to-end smoke: the minimum slice of SURVEY.md §7.2 step 2 — ViT-3D
3-class on synthetic volumes, asserting loss decreases and checkpoints
round-trip through resume."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data.synthetic import generate_synthetic_dataset
from vsn_tpu.train.cli import main as cli_main
from vsn_tpu.train.checkpoint import load_checkpoint
from vsn_tpu.train.trainer import train_fold


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    raw, csvs = generate_synthetic_dataset(
        root, n_subjects=40, shape=(20, 24, 20), diseases=("CN", "AD", "FTD"),
        kfold=10, seed=1,
    )
    return root, csvs


def tiny_cfg(**kw):
    base = dict(
        ARCHITECTURE="ViT",
        IMG_SIZE=[16, 20, 16],
        RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4],
        EMBED_DIM=48,
        DEPTH=2,
        HEADS=2,
        DISEASES=["CN", "AD", "FTD"],
        BATCH_SIZE=1,          # per-device; 8 virtual devices -> micro batch 8
        EFFECTIVE_BATCH_SIZE=16,
        STEPS=24,
        LR_WARMUP=4,
        WD_WARMUP=4,
        LR_BASE=1e-3,
        LR_FINAL=1e-4,
        VALIDATION_FREQUENCY=6,
        EARLY_STOPPING_PATIENCE=False,
        KEEP_BEST_N=2,
        SEED=42,
        FP16=False,
        STOCHASTIC_DEPTH_PROB=0.0,
    )
    base.update(kw)
    return load_config(extra_overrides=base)


def test_train_fold_end_to_end(synth, tmp_path):
    root, csvs = synth
    # EVAL_BATCH_SIZE decoupled from the train micro size (VERDICT r3 #5):
    # validation batches at 16 rows while training runs micro 8.
    cfg = tiny_cfg(EVAL_BATCH_SIZE=16)
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache", run_id="testrun1",
    )
    h = summary["history"]
    assert summary["steps"] == 24
    assert len(h["step"]) == 4  # validations at 6, 12, 18, 24
    # learning happened on the class-separable synthetic data
    assert h["train_loss"][-1] < h["train_loss"][0]
    assert h["val_loss"][-1] < h["val_loss"][0] + 0.1

    # artifacts
    runs = tmp_path / "runs"
    assert (runs / "model_testrun1_0_last.ckpt").exists()
    best = sorted(runs.glob("model_testrun1_0_best*.ckpt"))
    assert 1 <= len(best) <= 2
    payload, meta = load_checkpoint(best[0])
    assert meta["fold"] == 0 and "variables" in payload
    assert "params" in payload["variables"]
    run_dir = Path(summary["run_dir"])
    assert (run_dir / "config.yaml").exists()
    lines = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    rows = [l for l in lines if l.get("kind") != "summary"]
    assert rows[-1]["step"] == 24
    assert "val_bacc" in rows[-1]
    assert lines[-1].get("kind") == "summary" and "step_time" in lines[-1]
    # default-on saturation guard (VAL_ATTN_WATCH): every validation row
    # carries a finite attn_logit_max even with WATCH_GRADIENTS off, so the
    # fused-softmax clamp-80 deviation is observable in any default run
    assert all(np.isfinite(r["val_attn_logit_max"]) for r in rows)


def test_resume_from_checkpoint(synth, tmp_path):
    root, csvs = synth
    cfg = tiny_cfg(STEPS=12, VALIDATION_FREQUENCY=6)
    s1 = train_fold(
        cfg, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache", run_id="partial",
    )
    assert s1["steps"] == 12
    last = tmp_path / "runs" / "model_partial_0_last.ckpt"
    cfg2 = tiny_cfg(STEPS=18, VALIDATION_FREQUENCY=6)
    s2 = train_fold(
        cfg2, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache", run_id="resumed", resume_from=str(last),
    )
    assert s2["steps"] == 18  # continued from 12, not restarted
    assert len(s2["history"]["step"]) >= 3  # 6,12 from history + 18

    # fold-change refusal (reference train_transformer.py:2416-2425)
    cfg3 = tiny_cfg(STEPS=18, FOLD=3)
    with pytest.raises(ValueError, match="fold"):
        train_fold(
            cfg3, csv_dir=str(csvs), save_dir=tmp_path / "runs",
            cache_dir=tmp_path / "cache", resume_from=str(last),
        )


def test_early_stopping(synth, tmp_path):
    root, csvs = synth
    # impossible min_delta forces patience to trigger
    cfg = tiny_cfg(
        STEPS=30, VALIDATION_FREQUENCY=2, EARLY_STOPPING_PATIENCE=6,
        EARLY_STOPPING_MIN_DELTA=10.0,
    )
    s = train_fold(
        cfg, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache",
    )
    assert s["stopped_early"]
    assert s["steps"] <= 10


def test_cli_smoke(synth, tmp_path, capsys):
    root, csvs = synth
    import yaml

    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(tiny_cfg(STEPS=6, VALIDATION_FREQUENCY=3).to_dict(), f)
    summary = cli_main([
        "--training-csv-dir", str(csvs),
        "--save-dir", str(tmp_path / "runs"),
        "--intermediate-dir", str(tmp_path / "cache"),
        "--config", str(cfg_path),
        "--fold", "1",
        "--runname", "cli00001",
    ])
    assert summary["steps"] == 6
    assert summary["fold"] == 1
    assert (tmp_path / "runs" / "summary_cli00001_1.json").exists()


def test_profile_dir_produces_trace_and_step_times(synth, tmp_path):
    """VERDICT round-1 item 8: profile_dir wiring must actually exist."""
    root, csvs = synth
    cfg = tiny_cfg(STEPS=8, VALIDATION_FREQUENCY=8)
    prof = tmp_path / "prof"
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache", run_id="profrun1",
        profile_dir=str(prof), profile_steps=3,
    )
    assert summary["steps"] == 8
    # a trace directory with at least one event file was produced
    traced = list(prof.rglob("*"))
    assert any(p.is_file() for p in traced), traced
    # step-time percentiles land in the metrics.jsonl summary row
    run_dir = Path(summary["run_dir"])
    lines = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    summary_rows = [l for l in lines if l.get("kind") == "summary" or "step_time" in str(l)]
    assert summary_rows, lines
    st = next(l for l in lines if "step_time" in json.dumps(l))
    flat = json.dumps(st)
    assert "p50_s" in flat and "p90_s" in flat
