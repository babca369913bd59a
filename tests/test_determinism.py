"""Seeded-run reproducibility: the reference's 'Reproducibility Checklist'
property (SURVEY.md §4) — two identically-seeded runs must produce identical
training trajectories, and different seeds must diverge."""

import numpy as np
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data.synthetic import generate_synthetic_dataset
from vsn_tpu.train.trainer import train_fold


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("determ")
    raw, csvs = generate_synthetic_dataset(
        root, n_subjects=30, shape=(16, 16, 16), diseases=("CN", "AD", "FTD"),
        kfold=10, seed=9,
    )
    return root, csvs


def cfg_with(seed):
    return load_config(extra_overrides=dict(
        ARCHITECTURE="ViT", IMG_SIZE=[12, 12, 12], RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4], EMBED_DIM=32, DEPTH=1, HEADS=2,
        DISEASES=["CN", "AD", "FTD"], BATCH_SIZE=1, EFFECTIVE_BATCH_SIZE=8,
        STEPS=6, LR_WARMUP=2, WD_WARMUP=2, VALIDATION_FREQUENCY=3,
        EARLY_STOPPING_PATIENCE=False, KEEP_BEST_N=1, SEED=seed, FP16=False,
        STOCHASTIC_DEPTH_PROB=0.1, USE_MIXUP=True, MIXUP_PROB=0.5,
    ))


def run(root, csvs, seed, run_id):
    return train_fold(
        cfg_with(seed), csv_dir=str(csvs), save_dir=root / f"runs_{run_id}",
        cache_dir=root / "cache", run_id=run_id,
    )


def test_same_seed_identical_trajectory(synth):
    root, csvs = synth
    h1 = run(root, csvs, 123, "seedA1")["history"]
    h2 = run(root, csvs, 123, "seedA2")["history"]
    np.testing.assert_array_equal(h1["train_loss"], h2["train_loss"])
    np.testing.assert_array_equal(h1["val_loss"], h2["val_loss"])


def test_different_seed_diverges(synth):
    root, csvs = synth
    h1 = run(root, csvs, 123, "seedB1")["history"]
    h3 = run(root, csvs, 456, "seedB2")["history"]
    assert not np.allclose(h1["train_loss"], h3["train_loss"])
