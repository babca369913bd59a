"""DeepScaleLM-style stable transforms ("Transformers Get Stable", ICML 2024).

Residual gains and depth-aware initializers matching reference
utils/stable_init.py:

  * gains: beta^2 = k / N^alpha (clamped to [0,1]), lam^2 = 1 - beta^2 (22-62);
  * embedding/patch-projection init: std = sqrt(((1-p)/num_tables) / fan_in)
    (157-181);
  * Q/K init: std = 1/sqrt(d_in) (128-141, 199-206);
  * V / attention-out / FFN init: std = sqrt((sqrt(1-p)/2) / d_in) (106-125,
    207-226, 231-249).

The JAX version expresses these as initializer callables wired into the model
definitions (no post-hoc module walking — flax params are created with the
right distribution directly).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def compute_residual_gains(N: int, k: float = 2.0, alpha: float = 1.0):
    """(lam, beta) with beta^2 = k/N^alpha clamped to [0,1], lam^2 = 1-beta^2."""
    beta2 = k / (N**alpha)
    beta2 = min(max(beta2, 0.0), 1.0)
    lam2 = 1.0 - beta2
    return math.sqrt(lam2), math.sqrt(beta2)


def apply_stable_residual(x, fx, lam: float, beta: float):
    """x_out = lam*x + beta*f(x), variance-preserving residual."""
    return (lam * x + beta * fx).astype(x.dtype)


def stable_embedding_std(fan_in: int, dropout_prob: float = 0.0, num_tables: int = 1):
    return math.sqrt(((1.0 - dropout_prob) / num_tables) / fan_in)


def stable_qk_std(d_in: int) -> float:
    return 1.0 / math.sqrt(d_in)


def stable_vproj_std(d_in: int, dropout_prob: float = 0.0) -> float:
    """V / attention-out / FFN std: sqrt((sqrt(1-p)/2) / d_in)."""
    return math.sqrt((math.sqrt(1.0 - dropout_prob) / 2.0) / d_in)


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def verify_stable_init(
    model, variables, x, block_filter: str = "block", rtol: float = 0.5
):
    """Forward-variance self-verification (reference utils/stable_init.py:
    303-393): capture per-block outputs and check their variance stays within
    (1 ± rtol) of unity across depth. Returns (ok, {block_name: variance})."""
    import jax.numpy as jnp

    _, intermediates = model.apply(
        variables, x, True, capture_intermediates=True, mutable=["intermediates"]
    )

    variances = {}

    def walk(tree, prefix=""):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, path)
            elif key == "__call__":
                out = value[0]
                if hasattr(out, "shape") and getattr(out, "ndim", 0) >= 2:
                    if block_filter in prefix:
                        variances[prefix] = float(
                            jnp.var(out.astype(jnp.float32))
                        )

    walk(intermediates["intermediates"])
    block_vars = {
        k: v for k, v in variances.items()
        if k.count("/") == 0  # top-level blocks only
    } or variances
    ok = all(abs(v - 1.0) <= rtol for v in block_vars.values())
    return ok, block_vars


def verify_stable_gradients(loss_fn, variables, max_ratio: float = 3.0):
    """Gradient-norm balance check (reference utils/stable_init.py:396-449):
    the ratio of the largest to smallest per-top-level-module gradient norm
    must stay below ``max_ratio`` at init. Returns (ok, {module: norm})."""
    import jax
    import jax.numpy as jnp

    grads = jax.grad(loss_fn)(variables["params"])
    norms = {}
    for key, sub in grads.items():
        leaves = jax.tree.leaves(sub)
        if leaves:
            norms[key] = float(
                jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                             for l in leaves))
            )
    nonzero = [v for v in norms.values() if v > 0]
    if not nonzero:
        return False, norms
    ok = max(nonzero) / min(nonzero) <= max_ratio
    return ok, norms


def stable_qkv_init(d_in: int, dropout_prob: float = 0.0):
    """Initializer for a fused QKV kernel of shape (d_in, 3*d_inner).

    Q and K columns get std 1/sqrt(d_in); V columns get the FFN-style std —
    the columnwise analogue of the row-sliced init at reference
    utils/stable_init.py:207-218.
    """
    std_qk = stable_qk_std(d_in)
    std_v = stable_vproj_std(d_in, dropout_prob)

    def init(key, shape, dtype=jnp.float32):
        assert shape[0] == d_in and shape[1] % 3 == 0, shape
        d3 = shape[1] // 3
        base = nn.initializers.normal(stddev=1.0)(key, shape, dtype)
        scale = jnp.concatenate(
            [
                jnp.full((d3,), std_qk, dtype),
                jnp.full((d3,), std_qk, dtype),
                jnp.full((d3,), std_v, dtype),
            ]
        )
        return base * scale[None, :]

    return init
