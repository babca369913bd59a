"""Decompose the 37 ms stage-1 shifted block (micro 8, fwd+bwd):

  s1_roll   roll(+3)/roll(-3) round trip          (expected ~1 ms if healthy)
  s1_part   window partition+reverse round trip
  s1_ln     LayerNorm only
  s1_attn   attention half-block: norm+roll+partition+attn+reverse+roll+res
  s1_mlp    LN+MLP half-block

All jitted once, fetch-synced. Usage:
  setsid nohup python scripts/perf_probe_block.py > /tmp/blockprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsn_tpu.models.swin3d import (
    WindowAttention3D,
    shifted_window_region_ids,
    window_partition,
    window_reverse,
)

MICRO = 8
RES = (36, 42, 36)
C = 96
WINDOW = (6, 7, 6)
SHIFT = (3, 3, 3)
DT = jnp.bfloat16


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def timeit(name, fn, n=8, warmup=2):
    for _ in range(warmup):
        fetch(jax.tree.leaves(fn())[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:10s} {dt * 1e3:8.2f} ms", flush=True)


def grad_time(name, module, x, n=8):
    variables = module.init(jax.random.key(0), x, True)

    def loss(p, xx):
        return module.apply({"params": p}, xx, True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    timeit(name, lambda: g(variables["params"], x), n=n)


def main():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((MICRO, *RES, C)), DT)

    def roll_fn(xx):
        r = jnp.roll(xx, shift=(-3, -3, -3), axis=(1, 2, 3))
        return jnp.roll(r, shift=(3, 3, 3), axis=(1, 2, 3)).astype(
            jnp.float32).sum()

    g = jax.jit(jax.grad(roll_fn))
    timeit("s1_roll", lambda: g(x1))

    def part_fn(xx):
        w = window_partition(xx, WINDOW)
        return window_reverse(w * 1.000001, WINDOW, RES).astype(
            jnp.float32).sum()

    g2 = jax.jit(jax.grad(part_fn))
    timeit("s1_part", lambda: g2(x1))

    class LnOnly(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            return nn.LayerNorm(dtype=DT)(xx)

    grad_time("s1_ln", LnOnly(), x1)

    class AttnHalf(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            ids = jnp.asarray(shifted_window_region_ids(RES, WINDOW, SHIFT))
            h = nn.LayerNorm(dtype=DT)(xx)
            h = jnp.roll(h, shift=(-3, -3, -3), axis=(1, 2, 3))
            a = WindowAttention3D(
                window=WINDOW, num_heads=3, dtype=DT, use_pallas=True,
                name="attn",
            )(h, ids, deterministic)
            a = jnp.roll(a, shift=SHIFT, axis=(1, 2, 3))
            return xx + a

    grad_time("s1_attn", AttnHalf(), x1)

    class MlpHalf(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            from vsn_tpu.models.layers import Mlp
            h = nn.LayerNorm(dtype=DT)(xx)
            return xx + Mlp(hidden_features=4 * C, dtype=DT)(h, deterministic)

    grad_time("s1_mlp", MlpHalf(), x1)


if __name__ == "__main__":
    main()
