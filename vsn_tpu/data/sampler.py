"""Class-balanced sampling.

Reference utils/balanced_sampler.py semantics:
  * class weights = inverse class frequency normalized so the smallest weight
    is 1.0 (compute_class_weights:23-78);
  * per-sample weight = weight of the sample's class (compute_sample_weights:
    81-123);
  * per epoch, ``total_size`` indices are drawn WITH replacement proportional
    to the sample weights (multinomial, DistributedWeightedSampler:126-364);
    rank r takes the strided slice ``indices[r::world]``; ``set_epoch``
    reseeds the draw.

Host-side numpy; the draw happens once per epoch, off the device hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def compute_class_weights(labels, diseases) -> dict[str, float]:
    """Inverse-frequency weights normalized to min = 1.0."""
    counts = pd.Series(labels).value_counts()
    missing = [d for d in diseases if d not in counts.index]
    if missing:
        raise ValueError(f"classes with zero samples: {missing}")
    inv = {d: 1.0 / counts[d] for d in diseases}
    lo = min(inv.values())
    return {d: w / lo for d, w in inv.items()}


def compute_sample_weights(labels, diseases) -> np.ndarray:
    cw = compute_class_weights(labels, diseases)
    return np.asarray([cw[l] for l in labels], np.float64)


def weighted_epoch_indices(
    sample_weights: np.ndarray,
    total_size: int | None,
    rng: np.random.Generator,
    rank: int = 0,
    world_size: int = 1,
) -> np.ndarray:
    """Multinomial-with-replacement epoch draw, rank-strided partition."""
    n = len(sample_weights)
    if total_size is None:
        total_size = int(np.ceil(n / world_size)) * world_size
    p = np.asarray(sample_weights, np.float64)
    if np.any(p < 0) or p.sum() <= 0:
        raise ValueError("sample weights must be non-negative with positive sum")
    p = p / p.sum()
    indices = rng.choice(n, size=total_size, replace=True, p=p)
    return indices[rank::world_size]


def shuffled_epoch_indices(
    n: int,
    rng: np.random.Generator,
    rank: int = 0,
    world_size: int = 1,
    drop_last: bool = False,
) -> np.ndarray:
    """Plain shuffled epoch order (DistributedSampler equivalent)."""
    indices = rng.permutation(n)
    if world_size > 1:
        if drop_last:
            usable = (n // world_size) * world_size
            indices = indices[:usable]
        else:
            pad = (-len(indices)) % world_size
            if pad:
                indices = np.concatenate([indices, indices[:pad]])
    return indices[rank::world_size]
