"""Precomputed per-step schedules.

The reference precomputes full LR and WD arrays (linear warmup + cosine decay)
and indexes them by step (utils/helper.py:168-216, applied at
train/train_transformer.py:279-309). We keep the same array semantics — the
arrays become device constants indexed by the traced step counter inside the
jitted train step, which is cheaper on TPU than recomputing transcendentals
and guarantees numerical equality with the reference schedule definition.
"""

from __future__ import annotations

import numpy as np


def cosine_schedule_steps(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Linear warmup to ``base_value`` then cosine decay to ``final_value``.

    Matches reference utils/helper.py:168-216 exactly (including the
    ``np.linspace`` warmup endpoint convention: the warmup segment contains
    ``warmup_steps`` points ending exactly at ``base_value``).
    """
    if total_steps < 0:
        raise ValueError("total_steps must be non-negative")
    if warmup_steps > total_steps:
        raise ValueError("warmup_steps cannot exceed total_steps")

    warmup = (
        np.linspace(start_warmup_value, base_value, warmup_steps)
        if warmup_steps > 0
        else np.array([])
    )

    remaining = total_steps - warmup_steps
    if remaining > 0:
        steps = np.arange(remaining)
        decay = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * steps / remaining)
        )
        schedule = np.concatenate([warmup, decay])
    else:
        schedule = warmup

    assert len(schedule) == total_steps
    return schedule.astype(np.float64)


def cosine_schedule(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Epoch-based variant (reference utils/helper.py:118-165): warmup spans
    ``warmup_epochs * niter_per_ep`` iterations, cosine covers the rest."""
    return cosine_schedule_steps(
        base_value,
        final_value,
        total_steps=epochs * niter_per_ep,
        warmup_steps=warmup_epochs * niter_per_ep,
        start_warmup_value=start_warmup_value,
    )


def lr_wd_schedules(cfg) -> tuple[np.ndarray, np.ndarray]:
    """Build the (LR, WD) step arrays from a Config.

    Mirrors the two cosine_scheduler_steps calls at reference
    train/train_transformer.py:2284-2298.
    """
    lr = cosine_schedule_steps(
        cfg.LR_BASE, cfg.LR_FINAL, cfg.STEPS, warmup_steps=cfg.LR_WARMUP
    )
    wd = cosine_schedule_steps(
        cfg.WD_BASE, cfg.WD_FINAL, cfg.STEPS, warmup_steps=cfg.WD_WARMUP
    )
    return lr, wd
