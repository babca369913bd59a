"""SLANT region-volume features for the classical-ML (SVM) baseline.

Parity with reference dataset/preprocessing.py:18-614: per subject, the
feature vector is the fraction of brain-mask voxels assigned to each of the
133 SLANT atlas labels (average_by_structure:393-432); cached one file per
subject with the same incremental diff + stray GC protocol as the tensor
cache (DataPrepaSVM:476-614). Cache format is ``.npy`` float64 [133].
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

# The 133 SLANT atlas label ids (reference preprocessing.py:18-152
# LABELS_SLANT keys; names omitted — only the ids define the feature order).
SLANT_LABEL_IDS = np.array([
    0, 4, 11, 23, 30, 31, 32, 35, 36, 37, 38, 39, 40, 41, 44, 45, 47, 48,
    49, 50, 51, 52, 55, 56, 57, 58, 59, 60, 61, 62, 71, 72, 73, 75, 76,
    100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 112, 113, 114, 115,
    116, 117, 118, 119, 120, 121, 122, 123, 124, 125, 128, 129, 132, 133,
    134, 135, 136, 137, 138, 139, 140, 141, 142, 143, 144, 145, 146, 147,
    148, 149, 150, 151, 152, 153, 154, 155, 156, 157, 160, 161, 162, 163,
    164, 165, 166, 167, 168, 169, 170, 171, 172, 173, 174, 175, 176, 177,
    178, 179, 180, 181, 182, 183, 184, 185, 186, 187, 190, 191, 192, 193,
    194, 195, 196, 197, 198, 199, 200, 201, 202, 203, 204, 205, 206, 207,
], dtype=np.int64)

N_FEATURES = len(SLANT_LABEL_IDS)  # 133


def average_by_structure(seg_path, mask_path) -> np.ndarray:
    """Per-label voxel fraction inside the brain mask -> [133] float64."""
    from vsn_tpu.utils import nifti

    seg = nifti.load(seg_path).get_fdata().astype(np.int64)
    mask = nifti.load(mask_path).get_fdata() != 0
    masked = seg[mask]
    labels, counts = np.unique(masked, return_counts=True)
    table = np.zeros(int(SLANT_LABEL_IDS.max()) + 1, np.float64)
    in_range = labels <= SLANT_LABEL_IDS.max()
    table[labels[in_range]] = counts[in_range]
    features = table[SLANT_LABEL_IDS]
    return features / max(int(mask.sum()), 1)


class DataPrepaSVM:
    """Incremental SLANT-feature cache (metadata needs Subject, Seg_path,
    Mask_path columns)."""

    def __init__(self, metadata, preprocess_data_dir):
        self.metadata = (
            metadata if isinstance(metadata, pd.DataFrame)
            else pd.read_csv(metadata)
        )
        self.dir = Path(preprocess_data_dir)

    def _process_one(self, row) -> bool:
        try:
            features = average_by_structure(row.Seg_path, row.Mask_path)
            np.save(self.dir / f"{row.Subject}.npy", features)
            return True
        except Exception as e:  # noqa: BLE001 — per-subject skip & report
            print(f"Error processing subject {row.Subject}: {e}")
            return False

    def preprocess_data(self, n_jobs: int = 8) -> int:
        self.dir.mkdir(parents=True, exist_ok=True)
        have = {f.stem for f in self.dir.glob("*.npy")}
        want = set(self.metadata.Subject.values)
        for stray in have - want:
            os.remove(self.dir / f"{stray}.npy")
        todo = self.metadata[self.metadata.Subject.isin(want - have)]
        if len(todo) == 0:
            return 0
        rows = [todo.iloc[i] for i in range(len(todo))]
        with ThreadPoolExecutor(max_workers=max(1, n_jobs)) as ex:
            results = list(ex.map(self._process_one, rows))
        return int(sum(results))


def load_svm_features(preprocess_dir, metadata: pd.DataFrame, diseases):
    """(X [N, 133], Y [N] class indices) from the cache
    (reference preprocessing.py:435-473)."""
    preprocess_dir = Path(preprocess_dir)
    xs, ys = [], []
    for i in range(len(metadata)):
        subject = metadata.Subject.iloc[i]
        xs.append(np.load(preprocess_dir / f"{subject}.npy"))
        ys.append(diseases.index(metadata.Diagnosis.iloc[i]))
    return np.vstack(xs), np.asarray(ys)
