"""Classification losses.

Label-smoothing soft-target cross-entropy matching reference
regularization/label_smoothing.py:8-77: targets arrive as probability
distributions (one-hot or MixUp/CutMix mixtures); smoothing mixes them with
the uniform distribution before the CE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """Soft-target CE with optional uniform label smoothing.

    Args:
        logits: [N, C] float logits.
        targets: [N, C] soft target distributions.
        smoothing: epsilon in [0, 1); 0 disables.
        reduction: 'mean' | 'sum' | 'none'.
    """
    num_classes = logits.shape[-1]
    if num_classes < 2:
        raise ValueError(f"need >= 2 classes, got {num_classes}")
    if not 0.0 <= smoothing < 1.0:
        raise ValueError("smoothing must be in [0, 1)")

    t = targets.astype(jnp.float32)
    if smoothing > 0.0:
        t = t * (1.0 - smoothing) + smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -(t * logp).sum(axis=-1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")


def smoothing_from_config(cfg) -> float:
    """LABEL_SMOOTHING accepts False or a float (config-defaults.yaml:270-272)."""
    ls = cfg.get("LABEL_SMOOTHING", False)
    return 0.0 if ls is False or ls is None else float(ls)
