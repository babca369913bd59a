"""ResNet (BatchNorm) + EMA end-to-end: the trainer must run the BN-stat
refresh pass under EMA weights at the end (reference update_bn_stats)."""

import numpy as np
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data.synthetic import generate_synthetic_dataset
from vsn_tpu.train.checkpoint import load_checkpoint
from vsn_tpu.train.trainer import train_fold


def test_resnet_ema_bn_refresh(tmp_path):
    raw, csvs = generate_synthetic_dataset(
        tmp_path, n_subjects=30, shape=(16, 16, 16),
        diseases=("CN", "AD", "FTD"), kfold=10, seed=3,
    )
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="ResNet", IMG_SIZE=[12, 12, 12], RESHAPE_SIZE=False,
        DISEASES=["CN", "AD", "FTD"], BATCH_SIZE=1, EFFECTIVE_BATCH_SIZE=8,
        STEPS=4, LR_WARMUP=2, WD_WARMUP=2, VALIDATION_FREQUENCY=2,
        EARLY_STOPPING_PATIENCE=False, KEEP_BEST_N=1, SEED=5, FP16=False,
        USE_EMA=True, EMA_N_MODELS=2, UPDATE_BN_STATS=True, DROPOUT=0.1,
        RESNET_VARIANT="resnet10",
    ))
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=tmp_path / "runs",
        cache_dir=tmp_path / "cache", run_id="bnrefresh",
    )
    assert summary["steps"] == 4
    payload, meta = load_checkpoint(
        tmp_path / "runs" / "model_bnrefresh_0_last.ckpt"
    )
    ema = payload["state"]["ema"]["ema"]
    stats = ema["model_state"]["batch_stats"]
    leaves = [np.asarray(v) for v in _flatten(stats)]
    assert leaves and all(np.all(np.isfinite(l)) for l in leaves)
    # refreshed running stats should not all be the BN init values
    means = [l for l in leaves if np.any(l != 0)]
    assert means, "BN running stats were never updated"


def _flatten(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flatten(v)
    else:
        yield tree
