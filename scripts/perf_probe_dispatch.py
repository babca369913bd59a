"""Measure the axon tunnel's per-dispatch overhead and true kernel time.

  trivial      jit(x + 1) on a tiny array — pure dispatch latency
  chain1/4/16  fused attn-half applied k times inside ONE jit — the slope
               (t16 - t4) / 12 is the true per-kernel time, dispatch-free.

Usage: timeout 590 python scripts/perf_probe_dispatch.py
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


def timeit(name, fn, n=6, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:12s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    from vsn_tpu.models.swin3d import window_partition
    from vsn_tpu.ops.swin_block_kernels import fused_attn_half

    tiny = jnp.ones((8, 128))
    jt = jax.jit(lambda a: a + 1)
    timeit("trivial", lambda: jt(tiny), n=10)

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

    def chain(k):
        def f(a):
            for _ in range(k):
                a = fused_attn_half(a, lng, lnb, wqkv, bqkv, bias, ids0,
                                    wproj, bproj, ones, ones, scale, HEADS,
                                    1.0)
            return a
        jf = jax.jit(f)
        return lambda: jf(xw)

    ts = {}
    for k in (1, 4, 16):
        ts[k] = timeit(f"chain{k}", chain(k))
    slope = (ts[16] - ts[4]) / 12.0
    print(f"true attn-half fwd: {slope * 1e3:.2f} ms "
          f"(dispatch ~{(ts[1] - slope) * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
