"""Window-batch ablation: where does the stage-1 fused attn half spend time?

Sweeps VSN_ATTN_WB for the stage-1 attention half (fwd-only and fwd+bwd),
then times the remaining stage blocks with the auto heuristic.

Usage: setsid nohup python scripts/perf_probe_wb.py > /tmp/wbprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

MICRO = 8
WINDOW = (6, 7, 6)
DT = jnp.bfloat16


def fetch(o):
    return float(jnp.asarray(jax.tree.leaves(o)[0]).astype(jnp.float32).sum())


def timeit(name, fn, n=6, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:18s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    from vsn_tpu.ops.swin_block_kernels import fused_attn_half
    from vsn_tpu.models.swin3d import (
        shifted_window_region_ids, window_partition,
    )

    res, c, heads = (36, 42, 36), 96, 3
    n = WINDOW[0] * WINDOW[1] * WINDOW[2]
    hd = c // heads
    x5 = jnp.asarray(rng.standard_normal((MICRO, *res, c)), DT)
    xw = window_partition(x5, WINDOW)  # [BW, N, C]
    lng = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    ids0 = jnp.zeros((1, n), jnp.int32)
    ids_sh = jnp.asarray(shifted_window_region_ids(res, WINDOW, (3, 3, 3)))
    ones = jnp.ones((MICRO,), jnp.float32)
    scale = hd**-0.5

    def run_fwd(ids):
        f = jax.jit(lambda xx: fused_attn_half(
            xx, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
            ones, ones, scale, heads, 1.0))
        return lambda: f(xw)

    def run_grad(ids):
        g = jax.jit(jax.grad(lambda xx: fused_attn_half(
            xx, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
            ones, ones, scale, heads, 1.0).astype(jnp.float32).sum()))
        return lambda: g(xw)

    for wb in ("1", "8", "27"):
        os.environ["VSN_ATTN_WB"] = wb
        timeit(f"s1a_fwd_wb{wb}", run_fwd(ids0))
    for wb in ("1", "8", "27"):
        os.environ["VSN_ATTN_WB"] = wb
        timeit(f"s1a_fb_wb{wb}", run_grad(ids0))
    os.environ["VSN_ATTN_WB"] = "8"
    timeit("s1a_fb_sh_wb8", run_grad(ids_sh))
    del os.environ["VSN_ATTN_WB"]


if __name__ == "__main__":
    main()
