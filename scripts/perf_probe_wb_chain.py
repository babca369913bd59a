"""Dispatch-free WB sweep: chained fused attn-half fwd and fwd+bwd.

Per config, time jit(chain of k kernels) at k=4 and k=16; the slope is the
true per-kernel time (the axon tunnel adds ~6 ms per DISPATCH, which
contaminated the round-1 single-call numbers).

Usage: timeout 590 python scripts/perf_probe_wb_chain.py [fwd|bwd] [wbs...]
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
C, HEADS = 96, 3
N = WINDOW[0] * WINDOW[1] * WINDOW[2]


def fetch(o):
    return float(jnp.asarray(jax.tree.leaves(o)[0]).astype(jnp.float32).sum())


def timeit(fn, n=6, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    wbs = sys.argv[2:] or ["1", "4", "8", "12", "27"]
    rng = np.random.default_rng(0)
    from vsn_tpu.models.swin3d import window_partition

    x5 = jnp.asarray(
        rng.standard_normal((MICRO, 36, 42, 36, C)), jnp.bfloat16
    )
    xw = window_partition(x5, WINDOW)
    lng = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    bproj = jnp.zeros((C,), jnp.float32)
    ids0 = jnp.zeros((1, N), jnp.int32)
    ones = jnp.ones((MICRO,), jnp.float32)
    scale = (C // HEADS) ** -0.5

    def make(k):
        from vsn_tpu.ops.swin_block_kernels import fused_attn_half

        def f(a):
            for _ in range(k):
                a = fused_attn_half(a, lng, lnb, wqkv, bqkv, bias, ids0,
                                    wproj, bproj, ones, ones, scale, HEADS,
                                    1.0)
            return a

        if mode == "bwd":
            g = jax.jit(jax.grad(lambda a: f(a).astype(jnp.float32).sum()))
        else:
            g = jax.jit(f)
        return lambda: g(xw)

    for wb in wbs:
        os.environ["VSN_ATTN_WB"] = wb
        t4 = timeit(make(2))
        t16 = timeit(make(8))
        slope = (t16 - t4) / 6.0
        print(f"{mode} wb={wb:>3s}: {slope * 1e3:7.2f} ms/kernel "
              f"(t2 {t4*1e3:.1f}, t8 {t16*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
