"""NIfTI -> float16 tensor cache.

Per-subject preprocessing matching reference dataset/preprocessing.py:178-390
(DataPrepa): load T1 + brain mask, multiply, center-crop to IMG_SIZE, add a
channel dim, cast float16, save one file per subject; the cache is
incremental — subjects are diffed against existing files and strays deleted.

TPU-first differences:
  * cache files are ``{Subject}.npy`` numpy arrays (no torch dependency) laid
    out channels-LAST ``[D, H, W, 1]`` — the layout every model here consumes
    directly, so the host never transposes on the hot path;
  * optional downsampling uses trilinear interpolation via jax.image.resize on
    host CPU (the reference uses a nilearn affine resample,
    preprocessing.py:155-175 — equivalent up to boundary handling);
  * IO-bound work runs in a thread pool (the reference uses joblib threading,
    preprocessing.py:321-331) with a sequential fallback, and can be sharded
    across processes by (rank, world) like the reference's
    ``np.array_split(metadata, world)[rank]`` (train_transformer.py:1584-1595).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd


def center_crop(vol: np.ndarray, crop) -> np.ndarray:
    """Centered spatial crop (MONAI CenterSpatialCrop semantics: axes smaller
    than the ROI are left untouched)."""
    slices = []
    for size, c in zip(vol.shape, crop):
        if size <= c:
            slices.append(slice(None))
        else:
            center = size // 2
            start = center - c // 2
            slices.append(slice(start, start + c))
    return vol[tuple(slices)]


def resize_volume(vol: np.ndarray, target) -> np.ndarray:
    """Trilinear resize of a [D, H, W] volume on host CPU."""
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        import jax.image

        out = jax.image.resize(vol.astype(np.float32), tuple(target), method="linear")
        return np.asarray(out)


class DataPrepa:
    """Preprocess T1 MRIs into the float16 cache.

    Expects metadata with columns Subject, T1_path, Mask_path (reference
    preprocessing.py:178-183).
    """

    def __init__(self, metadata, preprocess_data_dir: str | Path):
        self.metadata = (
            metadata if isinstance(metadata, pd.DataFrame) else pd.read_csv(metadata)
        )
        self.dir = Path(preprocess_data_dir)

    def cache_path(self, subject: str) -> Path:
        return self.dir / f"{subject}.npy"

    def _process_one(self, row, crop, downsample) -> bool:
        try:
            from vsn_tpu.utils import nifti

            image = nifti.load(row.T1_path).get_fdata()
            mask = nifti.load(row.Mask_path).get_fdata()
            image = image * mask
            image = center_crop(image, crop)
            if downsample and tuple(downsample) != tuple(crop):
                image = resize_volume(image, downsample)
            image = image[..., None].astype(np.float16)  # [D, H, W, 1]
            np.save(self.cache_path(row.Subject), image)
            return True
        except Exception as e:  # noqa: BLE001 — per-subject skip & report
            print(f"Error processing subject {row.Subject}: {e}")
            return False

    def _diff_cache(self) -> pd.DataFrame | None:
        """Incremental-diff + stray GC (reference preprocessing.py:359-390)."""
        df_subjects = set(self.metadata.Subject.values)
        file_subjects = {f.stem for f in self.dir.glob("*.npy")}
        for stray in file_subjects - df_subjects:
            os.remove(self.dir / f"{stray}.npy")
        todo = df_subjects - file_subjects
        if not todo:
            return None
        return self.metadata[self.metadata.Subject.isin(todo)]

    def preprocess_data(
        self,
        crop,
        downsample=None,
        n_jobs: int = 8,
        rank: int = 0,
        world_size: int = 1,
        verbose: int = 0,
    ) -> int:
        """Process missing subjects; returns the number processed.

        With world_size > 1 each process handles its rank's shard of the
        missing subjects (callers barrier afterwards).
        """
        if len(crop) != 3:
            raise ValueError(f"crop must have length 3, got {len(crop)}")
        self.dir.mkdir(parents=True, exist_ok=True)

        todo = self._diff_cache()
        if todo is None:
            return 0
        if world_size > 1:
            todo = np.array_split(todo, world_size)[rank]
        if len(todo) == 0:
            return 0

        rows = [todo.iloc[i] for i in range(len(todo))]
        try:
            with ThreadPoolExecutor(max_workers=max(1, n_jobs)) as ex:
                results = list(
                    ex.map(lambda r: self._process_one(r, crop, downsample), rows)
                )
        except Exception as e:  # pragma: no cover — sequential fallback
            print(f"Parallel preprocessing failed ({e}); falling back to sequential")
            results = [self._process_one(r, crop, downsample) for r in rows]

        ok = int(sum(results))
        if verbose:
            print(f"Processed {ok}/{len(rows)} subjects")
        return ok
