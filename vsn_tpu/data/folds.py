"""Rotating K-fold cross-validation split reader.

Protocol identical to the reference (utils/helper.py:346-414): the metadata
directory holds ``fold_0.csv .. fold_{K-1}.csv``; for configuration ``fold``,
folds ``(fold+i) % K`` for i in [0, split0) are train, the next split1 are
val, the remaining are test. CSVs carry at least ``Subject`` and ``Diagnosis``
columns (plus ``Dataset`` for cohort filtering).
"""

from __future__ import annotations

import re
from pathlib import Path

import pandas as pd


def get_train_val_test(
    metadata_dir: str,
    fold: int,
    kfold: int,
    split: tuple[int, int, int] = (7, 2, 1),
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (train, val, test, all) metadata DataFrames for a fold.

    Invariants match reference utils/helper.py:380-392: split has 3 parts that
    sum to kfold, kfold >= 3, fold in [0, kfold), and exactly kfold files named
    ``fold_<n>.csv`` exist.
    """
    if len(split) != 3:
        raise ValueError("split must have three entries (train, val, test)")
    if kfold < 3:
        raise ValueError("kfold must be at least 3")
    if sum(split) != kfold:
        raise ValueError(f"sum(split) must equal kfold={kfold}, got {sum(split)}")
    if not 0 <= fold < kfold:
        raise ValueError(f"fold must be in [0, {kfold})")

    files = [
        p
        for p in Path(metadata_dir).glob("fold_*.csv")
        if re.fullmatch(r"fold_[0-9]+\.csv", p.name)
    ]
    if len(files) != kfold:
        raise FileNotFoundError(
            f"expected {kfold} fold CSVs in {metadata_dir}, found {len(files)}"
        )

    def read(indices):
        frames = [
            pd.read_csv(Path(metadata_dir) / f"fold_{i}.csv") for i in indices
        ]
        return pd.concat(frames, ignore_index=True).reset_index(drop=True)

    n_train, n_val, _ = split
    train_idx = [(fold + i) % kfold for i in range(n_train)]
    val_idx = [(fold + i) % kfold for i in range(n_train, n_train + n_val)]
    test_idx = [(fold + i) % kfold for i in range(n_train + n_val, kfold)]

    meta_train = read(train_idx)
    meta_val = read(val_idx)
    meta_test = read(test_idx)
    meta_all = (
        pd.concat([meta_train, meta_val, meta_test])
        .sort_values(by="Subject")
        .reset_index(drop=True)
    )
    return meta_train, meta_val, meta_test, meta_all


def load_metadata(
    metadata_paths,
    accept_datasets: list[str] | None = None,
) -> pd.DataFrame:
    """Load/concatenate metadata CSVs, optionally filtering by Dataset column.

    Mirrors reference dataset/dataset.py:19-39.
    """
    if isinstance(metadata_paths, str):
        metadata = pd.read_csv(metadata_paths).reset_index(drop=True)
    elif isinstance(metadata_paths, (list, tuple)):
        metadata = pd.concat(
            [pd.read_csv(p) for p in metadata_paths], ignore_index=True
        ).reset_index(drop=True)
    elif isinstance(metadata_paths, (pd.DataFrame, pd.Series)):
        metadata = metadata_paths.reset_index(drop=True)
    else:
        raise TypeError(f"unsupported metadata source: {type(metadata_paths)}")

    if accept_datasets is not None:
        metadata = metadata[metadata.Dataset.isin(accept_datasets)].reset_index(
            drop=True
        )
    return metadata
