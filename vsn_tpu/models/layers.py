"""Shared building blocks: norms, LayerScale, DropPath, ShakeDrop, stable
residuals, MLP.

TPU-first notes:
  * All stochastic layers consume flax RNG streams ("dropout", "shakedrop"),
    so the whole forward stays traceable and fuses under jit.
  * ShakeDrop's asymmetric backward (alpha forward, independent beta backward,
    reference regularization/shakedrop.py:10-94) is a ``jax.custom_vjp`` — both
    random draws happen in the forward, beta rides the residuals.
  * Stable residuals lam*x + beta*f(x) follow reference utils/stable_init.py:22-85.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Norm layers
# ---------------------------------------------------------------------------

class RMSNorm(nn.Module):
    """Root-mean-square norm (reference models/modules/rms_norm.py:5-31)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(self.dtype)


class DynamicTanh(nn.Module):
    """DyT(x) = gamma * tanh(alpha * x) + beta — normalization-free option
    exposed by the NORM_LAYER config key (reference config-defaults.yaml:53-55).
    """

    alpha_init: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        alpha = self.param(
            "alpha", nn.initializers.constant(self.alpha_init), (), jnp.float32
        )
        gamma = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (dim,), jnp.float32)
        y = jnp.tanh(alpha * x.astype(jnp.float32))
        return (gamma * y + beta).astype(self.dtype)


def make_norm(norm_name: str | None, dtype=jnp.float32) -> Callable[..., nn.Module]:
    """Map the NORM_LAYER config string to a norm constructor."""
    if norm_name in (None, False, "nn.LayerNorm", "LayerNorm"):
        return lambda **kw: nn.LayerNorm(epsilon=1e-5, dtype=dtype, **kw)
    if norm_name == "RMSNorm":
        return lambda **kw: RMSNorm(dtype=dtype, **kw)
    if norm_name == "DynamicTanh":
        return lambda **kw: DynamicTanh(dtype=dtype, **kw)
    raise ValueError(f"Unknown NORM_LAYER: {norm_name!r}")


# ---------------------------------------------------------------------------
# LayerScale
# ---------------------------------------------------------------------------

class LayerScale(nn.Module):
    """Learnable per-channel residual-branch scaling (CaiT).

    Reference models/modules/layerscale.py:22-54; ``create_layerscale``
    returns None when disabled (57-79) — here callers use
    ``maybe_layerscale``.
    """

    init_value: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (dim,), jnp.float32
        )
        return (x.astype(jnp.float32) * gamma).astype(self.dtype)


# ---------------------------------------------------------------------------
# DropPath (per-sample stochastic depth)
# ---------------------------------------------------------------------------

def drop_path(
    x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Per-sample stochastic depth with 1/keep rescaling (timm semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


# ---------------------------------------------------------------------------
# ShakeDrop
# ---------------------------------------------------------------------------

def _shakedrop_fwd_value(x, gate, alpha):
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    alpha = alpha.reshape(shape).astype(x.dtype)
    return jnp.where(gate, x, alpha * x)


@jax.custom_vjp
def _shakedrop_train(x, gate, alpha, beta):
    return _shakedrop_fwd_value(x, gate, alpha)


def _shakedrop_train_fwd(x, gate, alpha, beta):
    return _shakedrop_fwd_value(x, gate, alpha), (gate, beta, x.ndim)


def _shakedrop_train_bwd(res, g):
    gate, beta, ndim = res
    shape = (g.shape[0],) + (1,) * (ndim - 1)
    beta = beta.reshape(shape).astype(g.dtype)
    gx = jnp.where(gate, g, beta * g)
    return gx, None, None, None


_shakedrop_train.defvjp(_shakedrop_train_fwd, _shakedrop_train_bwd)


def shakedrop(
    x: jax.Array,
    p_drop: float,
    alpha_range: tuple[float, float],
    deterministic: bool,
    rng: Optional[jax.Array],
) -> jax.Array:
    """ShakeDrop regularization (reference regularization/shakedrop.py:10-94).

    Train forward: with prob ``p_drop`` the branch is "dropped" and scaled by a
    per-sample alpha ~ U(alpha_range); otherwise passed through. Backward when
    dropped scales gradients by an independent per-sample beta ~ U(0, 1).
    Eval forward scales by (1 - p_drop).
    """
    if deterministic:
        return (1.0 - p_drop) * x
    k_gate, k_alpha, k_beta = jax.random.split(rng, 3)
    n = x.shape[0]
    # Scalar gate per call, matching the reference's single Bernoulli draw.
    gate = jax.random.bernoulli(k_gate, 1.0 - p_drop, ())
    a0, a1 = alpha_range
    alpha = jax.random.uniform(k_alpha, (n,), minval=a0, maxval=a1)
    beta = jax.random.uniform(k_beta, (n,), minval=0.0, maxval=1.0)
    return _shakedrop_train(x, gate, alpha, beta)


def residual_branch_gains(
    n: int,
    drop_path_rate: float,
    use_shakedrop: bool,
    alpha_range: tuple[float, float],
    deterministic: bool,
    rng: Optional[jax.Array],
):
    """Per-sample (forward, backward) branch multipliers equivalent to the
    ShakeDrop/DropPath wrappers above, for consumption by the fused block
    kernels (vsn_tpu/ops/swin_block_kernels.py).

    Draw order and shapes match ``shakedrop``/``drop_path`` exactly, so a
    given rng produces the same gating decisions on both paths.
    """
    ones = jnp.ones((n,), jnp.float32)
    if use_shakedrop and drop_path_rate > 0.0:
        if deterministic:
            g = jnp.full((n,), 1.0 - drop_path_rate, jnp.float32)
            return g, g
        k_gate, k_alpha, k_beta = jax.random.split(rng, 3)
        gate = jax.random.bernoulli(k_gate, 1.0 - drop_path_rate, ())
        a0, a1 = alpha_range
        alpha = jax.random.uniform(k_alpha, (n,), minval=a0, maxval=a1)
        beta = jax.random.uniform(k_beta, (n,), minval=0.0, maxval=1.0)
        return jnp.where(gate, ones, alpha), jnp.where(gate, ones, beta)
    if drop_path_rate > 0.0 and not deterministic:
        keep = 1.0 - drop_path_rate
        mask = jax.random.bernoulli(rng, keep, (n,))
        g = mask.astype(jnp.float32) / keep
        return g, g
    return ones, ones


def _gated_residual_value(x, branch, gf, gb, lam):
    gshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return (lam * x.astype(jnp.float32)
            + gf.reshape(gshape) * branch.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gated_residual(x, branch, gf, gb, lam):
    """lam * x + gf[s] * branch with backward dbranch = gb[s] * do —
    the (gf, gb) gain form of ShakeDrop/DropPath (see
    residual_branch_gains); gains are constants to the VJP."""
    return _gated_residual_value(x, branch, gf, gb, lam)


def _gated_residual_fwd(x, branch, gf, gb, lam):
    return _gated_residual_value(x, branch, gf, gb, lam), (gf, gb, x.ndim)


def _gated_residual_bwd(lam, res, do):
    gf, gb, ndim = res
    gshape = (do.shape[0],) + (1,) * (ndim - 1)
    return (lam * do,
            (gb.reshape(gshape) * do.astype(jnp.float32)).astype(do.dtype),
            jnp.zeros_like(gf), jnp.zeros_like(gb))


gated_residual.defvjp(_gated_residual_fwd, _gated_residual_bwd)


# ---------------------------------------------------------------------------
# Residual branch wrapper: LayerScale -> ShakeDrop/DropPath -> (stable) residual
# ---------------------------------------------------------------------------

class ResidualBranch(nn.Module):
    """Applies the configured residual decorations shared by every backbone.

    Order matches the reference blocks (e.g. models/swin_transformer_3d.py:
    360-380): branch -> [post-norm] -> LayerScale -> ShakeDrop|DropPath ->
    lam*x + beta*branch (stable) or x + branch.
    """

    drop_path_rate: float = 0.0
    use_shakedrop: bool = False
    shakedrop_alpha_range: tuple[float, float] = (-1.0, 1.0)
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    stable_lam: float = 1.0
    stable_beta: float = 0.0
    enable_stable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, branch, deterministic: bool):
        if self.layer_scale:
            branch = LayerScale(
                init_value=self.layer_scale_init_value, dtype=self.dtype
            )(branch)
        if self.use_shakedrop and self.drop_path_rate > 0.0:
            rng = None if deterministic else self.make_rng("shakedrop")
            branch = shakedrop(
                branch,
                self.drop_path_rate,
                self.shakedrop_alpha_range,
                deterministic,
                rng,
            )
        elif self.drop_path_rate > 0.0:
            rng = None if deterministic else self.make_rng("dropout")
            branch = drop_path(branch, self.drop_path_rate, deterministic, rng)
        if self.enable_stable:
            return (self.stable_lam * x + self.stable_beta * branch).astype(x.dtype)
        return x + branch


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (reference swin MLP,
    models/swin_transformer_3d.py:52-69)."""

    hidden_features: int
    out_features: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.truncated_normal(stddev=0.02)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            out_features, dtype=self.dtype, kernel_init=self.kernel_init, name="fc2"
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def stochastic_depth_rates(total_rate: float, depths: Sequence[int]) -> list[float]:
    """Linearly increasing DropPath rates across all blocks.

    Matches ``torch.linspace(0, rate, sum(depths))`` at reference
    models/swin_transformer_3d.py:637.
    """
    n = sum(depths)
    if n <= 1:
        return [0.0] * n
    return [total_rate * i / (n - 1) for i in range(n)]


def trunc_normal_init(stddev: float = 0.02):
    """timm-style truncated normal (±2σ) initializer."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)
