"""Optimizer: AdamW with per-step LR/WD injection, decay masking, clipping, SAM.

Reference semantics being reproduced:
  * AdamW with two param groups — biases and 1-D params get weight decay 0
    (utils/helper.py:219-247 get_params_groups); betas (0.9, 0.999), eps 1e-8
    (torch defaults used at train/train_transformer.py:2122-2147);
  * LR and WD are *values indexed per step* from precomputed arrays
    (train/train_transformer.py:279-309), not optax schedules — the arrays are
    device constants and the step index is traced;
  * optional global-norm gradient clipping (1198-1216);
  * SAM (regularization/sam.py:9-165): perturb by rho * g/||g|| (adaptive:
    elementwise |w|-scaled), recompute grads at the perturbed point, update
    the *original* params with the perturbed gradients. The JAX version is a
    pure two-grad-call function — no parameter caching/restoring.

TPU-first: everything is a pure pytree->pytree function inside the single
jitted train step; the optimizer math runs fused with the backward pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def wd_mask(params) -> object:
    """True where decoupled weight decay applies: ndim >= 2 ("not a bias nor
    a norm/scale parameter", utils/helper.py:239-246)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


class AdamWState(NamedTuple):
    mu: object
    nu: object
    count: jax.Array


def adamw_init(params) -> AdamWState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamWState(
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
        count=jnp.zeros((), jnp.int32),
    )


def adamw_update(
    grads,
    state: AdamWState,
    params,
    lr,
    weight_decay,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One decoupled-AdamW step with traced lr / weight_decay scalars.

    p <- p - lr * (m_hat / (sqrt(v_hat) + eps) + wd * p)   [wd masked]
    """
    count = state.count + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads)
    c1 = 1 - b1 ** count.astype(jnp.float32)
    c2 = 1 - b2 ** count.astype(jnp.float32)
    mask = wd_mask(params)

    def upd(p, m, v, use_wd):
        step = (m / c1) / (jnp.sqrt(v / c2) + eps)
        if use_wd:
            step = step + weight_decay * p
        return (p - lr * step).astype(p.dtype)

    new_params = jax.tree.map(
        lambda p, m, v, msk: upd(p, m, v, msk), params, mu, nu, mask
    )
    return new_params, AdamWState(mu=mu, nu=nu, count=count)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


def clip_by_global_norm(grads, max_norm: float):
    """Scale grads so their global norm is at most max_norm (torch semantics)."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def sam_perturbation(params, grads, rho: float, adaptive: bool):
    """e(w) = rho * g / ||g||  (adaptive: e = rho * w^2 g / || |w| g ||).

    Mirrors reference regularization/sam.py:38-75 (first_step) and the
    adaptive norm at 122-155 (_grad_norm). Invalid/zero norms produce a zero
    perturbation (the reference skips perturbing in that case).
    """
    if adaptive:
        norm_tree = jax.tree.map(lambda p, g: jnp.abs(p) * g, params, grads)
    else:
        norm_tree = grads
    gnorm = global_norm(norm_tree)
    safe = jnp.isfinite(gnorm) & (gnorm > 0)
    scale = jnp.where(safe, rho / (gnorm + 1e-12), 0.0)

    def e_w(p, g):
        e = g * scale
        if adaptive:
            e = jnp.square(p) * e
        # where() (not scale*0) so NaN/Inf grads yield an exactly-zero
        # perturbation, like the reference's validity check (sam.py:66-70).
        return jnp.where(safe, e, 0.0).astype(p.dtype)

    return jax.tree.map(e_w, params, grads), gnorm


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_scale(a, s):
    return jax.tree.map(lambda x: x * s, a)


def all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the tree is finite everywhere."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(tree)]
    return jnp.stack(leaves).all() if leaves else jnp.bool_(True)
