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

    if os.environ.get("VSN_PROBE_FUSED"):
        from vsn_tpu.models.swin3d import SwinBlock3D

        class FusedBlock(nn.Module):
            shifted: bool

            @nn.compact
            def __call__(self, xx, deterministic=True):
                ids = (
                    jnp.asarray(
                        shifted_window_region_ids(RES, WINDOW, SHIFT)
                    ) if self.shifted else None
                )
                return SwinBlock3D(
                    num_heads=3, window=WINDOW,
                    shift=SHIFT if self.shifted else (0, 0, 0),
                    use_pallas=True, dtype=DT, name="blk",
                )(xx, ids, deterministic)

        grad_time("s1_fblk_ns", FusedBlock(shifted=False), x1)
        grad_time("s1_fblk_sh", FusedBlock(shifted=True), x1)

        from vsn_tpu.ops.swin_block_kernels import (
            fused_attn_half, fused_ln_mlp, mlp_tile_rows,
        )

        class FAttn(nn.Module):
            @nn.compact
            def __call__(self, xx, deterministic=True):
                from vsn_tpu.models.swin3d import (
                    _AttnParams, _NormParams, relative_position_index,
                )
                n = WINDOW[0] * WINDOW[1] * WINDOW[2]
                lng, lnb = _NormParams(C, name="norm1")()
                bt, wqkv, bqkv, wproj, bproj = _AttnParams(
                    dim=C, num_heads=3, window=WINDOW, qkv_bias=True,
                    enable_stable=False, attn_drop=0.0, proj_drop=0.0,
                    name="attn",
                )()
                rel = relative_position_index(WINDOW)
                bias = bt[rel.reshape(-1)].reshape(n, n, 3).transpose(2, 0, 1)
                wdws = window_partition(xx, WINDOW)
                ids = jnp.zeros((1, n), jnp.int32)
                ones = jnp.ones((MICRO,), jnp.float32)
                o = fused_attn_half(wdws, lng, lnb, wqkv, bqkv, bias, ids,
                                    wproj, bproj, ones, ones,
                                    (C // 3) ** -0.5, 3, 1.0)
                return window_reverse(o, WINDOW, RES)

        grad_time("s1_fattn", FAttn(), x1)

        class FMlp(nn.Module):
            @nn.compact
            def __call__(self, xx, deterministic=True):
                from vsn_tpu.models.swin3d import _MlpParams, _NormParams
                from vsn_tpu.models.layers import trunc_normal_init
                lng, lnb = _NormParams(C, name="norm2")()
                w1, b1, w2, b2 = _MlpParams(
                    dim=C, hidden=4 * C,
                    kernel_init=trunc_normal_init(0.02), name="mlp",
                )()
                t = xx.size // C
                flat = xx.reshape(t, C)
                ones = jnp.ones((MICRO,), jnp.float32)
                return fused_ln_mlp(
                    flat, lng, lnb, w1, b1, w2, b2, ones, ones,
                    mlp_tile_rows(t // MICRO), 1.0
                ).reshape(xx.shape)

        grad_time("s1_fmlp", FMlp(), x1)

        def res_fn(xx):
            return (xx + xx * 1.000001).astype(jnp.float32).sum()

        gres = jax.jit(jax.grad(res_fn))
        timeit("s1_resadd", lambda: gres(x1))
        return

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
