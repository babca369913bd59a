"""A/B the fused windows->windows junction kernel vs the XLA glue chain.

The window-resident residual stream (models/swin3d.BasicLayer3D) pays one
window_glue per shift junction: reverse -> roll3d -> window_partition,
fused by XLA but still a transpose-lowered relayout (4.17 ms fwd / 5.27 ms
grad for the stage-1 chain, scripts/perf_probe_glue.py). The Pallas
windows_to_windows kernel (ops/window_relayout.py) does the junction in a
single HBM pass with the roll folded into BlockSpec index maps.

Asserts bit-parity on chip before timing; times both junction directions
(unshift->shift t=s and shift->unshift t=dim-s) at stage-1 and stage-2
geometry, fwd and grad.

Usage: setsid nohup timeout 3600 python scripts/perf_probe_w2w.py \
    > /tmp/q_w2w.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.models.swin3d import window_glue, window_partition
from vsn_tpu.ops.window_relayout import windows_to_windows

B = 8


def timeit(name, fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    print(f"{name:28s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def probe(tag, dims, win, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, *dims, c)), jnp.bfloat16)
    wins = jax.jit(lambda xx: window_partition(xx, win))(x)
    shift = tuple(w // 2 for w in win)
    for jname, t in (
        ("shift", shift),
        ("unshift", tuple(d - s for d, s in zip(dims, shift))),
    ):
        ref = jax.jit(lambda w, t=t: window_glue(w, win, dims, t))
        pal = jax.jit(lambda w, t=t: windows_to_windows(
            w, win, dims, tuple(-v for v in t)))
        a, b = ref(wins), pal(wins)
        d = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"{tag}/{jname} parity max|d| {d:.3e}", flush=True)
        assert d == 0.0, d
        timeit(f"{tag}/{jname} xla_chain", ref, wins)
        timeit(f"{tag}/{jname} pallas_w2w", pal, wins)
        g_ref = jax.jit(jax.grad(
            lambda w, t=t: window_glue(
                w, win, dims, t).astype(jnp.float32).sum()))
        g_pal = jax.jit(jax.grad(
            lambda w, t=t: windows_to_windows(
                w, win, dims,
                tuple(-v for v in t)).astype(jnp.float32).sum()))
        timeit(f"{tag}/{jname} xla_grad", g_ref, wins, n=4)
        timeit(f"{tag}/{jname} pallas_grad", g_pal, wins, n=4)


def main():
    os.environ["VSN_PALLAS_RELAYOUT"] = "1"
    os.environ.pop("VSN_PALLAS_GLUE", None)  # call forms directly
    # only the window-resident (pad-free) stages run the glue:
    # stage 1 (36,42,36) and stage 2 (18,21,18) at production geometry
    probe("stage1", (36, 42, 36), (6, 7, 6), 96)
    probe("stage2", (18, 21, 18), (6, 7, 6), 192)


if __name__ == "__main__":
    main()
