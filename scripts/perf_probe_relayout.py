"""A/B the Pallas window relayout kernels vs the XLA jnp forms, on chip.

Stage-1 Swin-T geometry (micro 8): [8, 36, 42, 36, 96] bf16, window
(6,7,6). Raw HBM bound for one pass is ~0.21 ms; XLA's partition measured
3.48 ms (scripts/perf_probe_glue.py). Asserts bit-parity before timing.

Usage: setsid nohup timeout 3600 python scripts/perf_probe_relayout.py \
    > /tmp/q_relayout.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.models.swin3d import roll3d, window_partition, window_reverse
from vsn_tpu.ops.window_relayout import (
    spatial_to_windows,
    windows_to_spatial,
)

DIMS = (36, 42, 36)
WIN = (6, 7, 6)
B = 8
C = 96
SHIFT = (3, 3, 3)


def timeit(name, fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    print(f"{name:24s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def main():
    os.environ["VSN_PALLAS_RELAYOUT"] = "1"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, *DIMS, C)), jnp.bfloat16)

    ref_s2w = jax.jit(lambda xx: window_partition(roll3d(xx, SHIFT), WIN))
    pal_s2w = jax.jit(lambda xx: spatial_to_windows(xx, WIN, SHIFT))
    a, b = ref_s2w(x), pal_s2w(x)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"s2w parity max|d| {d:.3e}", flush=True)
    assert d == 0.0, d

    wins = ref_s2w(x)
    ref_w2s = jax.jit(
        lambda w: roll3d(window_reverse(w, WIN, DIMS), SHIFT))
    pal_w2s = jax.jit(lambda w: windows_to_spatial(w, WIN, DIMS, SHIFT))
    a, b = ref_w2s(wins), pal_w2s(wins)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"w2s parity max|d| {d:.3e}", flush=True)
    assert d == 0.0, d

    timeit("xla_partition_roll", ref_s2w, x)
    timeit("pallas_s2w", pal_s2w, x)
    timeit("xla_reverse_roll", ref_w2s, wins)
    timeit("pallas_w2s", pal_w2s, wins)

    # grads (the adjoints are the mirrored kernels)
    g_ref = jax.jit(jax.grad(
        lambda xx: ref_s2w(xx).astype(jnp.float32).sum()))
    g_pal = jax.jit(jax.grad(
        lambda xx: pal_s2w(xx).astype(jnp.float32).sum()))
    timeit("xla_s2w_grad", g_ref, x, n=4)
    timeit("pallas_s2w_grad", g_pal, x, n=4)

    # micro 32 scale (the production accumulation micro-batch)
    x32 = jnp.asarray(rng.standard_normal((32, *DIMS, C)), jnp.bfloat16)
    timeit("xla_s2w_micro32", ref_s2w, x32, n=4)
    timeit("pallas_s2w_micro32", pal_s2w, x32, n=4)


if __name__ == "__main__":
    main()
