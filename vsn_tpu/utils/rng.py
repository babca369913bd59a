"""Deterministic RNG plumbing.

The reference seeds python/numpy/torch globals plus per-component offsets
(reference utils/seed.py:37-60; train/train_transformer.py:1640-1654 uses
base+1 for val loaders, base+2 for MixUp, base+rank per process). JAX is
functional, so instead of global seeding we derive a key *hierarchy* that
mirrors the (base, component, rank/epoch/step) scheme. Bit-parity with torch
RNG is explicitly a non-goal; self-consistency of seeded runs is the contract.
"""

from __future__ import annotations

import numpy as np
import jax

_MAX_UINT32 = 2**32 - 1  # reference utils/seed.py `_MAX_UINT32`

# Component offsets, mirroring the reference's "+1 val / +2 mixup" scheme.
COMPONENT_OFFSETS = {
    "init": 0,
    "train": 1,
    "val": 2,
    "mixup": 3,
    "cutmix": 4,
    "augment": 5,
    "sampler": 6,
    "dropout": 7,
    "tta": 8,
    "bootstrap": 9,
    "shakedrop": 10,
}


def base_key(seed: int | None) -> jax.Array:
    """Root key. A disabled seed draws entropy from numpy's global RNG."""
    if seed is None:
        seed = int(np.random.SeedSequence().generate_state(1)[0])
    return jax.random.key(seed % _MAX_UINT32)


def component_key(root: jax.Array, component: str, rank: int = 0) -> jax.Array:
    """Per-component (and per-process rank) key."""
    k = jax.random.fold_in(root, COMPONENT_OFFSETS[component])
    if rank:
        k = jax.random.fold_in(k, rank)
    return k


def step_key(key: jax.Array, step: int | jax.Array) -> jax.Array:
    """Per-step key, foldable inside jit (step may be traced)."""
    return jax.random.fold_in(key, step)


def epoch_rng(seed: int | None, component: str, epoch: int) -> np.random.Generator:
    """Host-side numpy Generator keyed by (seed, component, epoch).

    Used by the input pipeline for sampling decisions the reference makes in
    DataLoader workers (MixUp partners, balanced-sampler draws, shuffles).
    """
    if seed is None:
        return np.random.default_rng()
    ss = np.random.SeedSequence(
        entropy=seed, spawn_key=(COMPONENT_OFFSETS[component], epoch)
    )
    return np.random.default_rng(ss)
