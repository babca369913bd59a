"""Inter-block relayout glue: what does reverse -> roll -> partition cost,
and can a single fused expression beat the 3-op chain?

Between consecutive Swin blocks the residual stream lives as windows
[BW, N, C]; the glue back to the next block's (shifted) window layout is
window_reverse -> roll3d -> window_partition. Stage-1 fwd+bwd is 56.5 of
95.9 ms (BASELINE.md) and the kernels account for ~44, so this glue is the
bulk of the rest.

Candidates:
  glue_chain   reverse -> roll3d(pad+slice) -> partition (current)
  glue_chain0  reverse -> partition (unshifted junction, for scale)
  glue_corner  single expression: grid-roll (outer-dim concat, big chunks)
    then 2^3 corner slices of the 8D window view concatenated along the
    window-LOCAL dims -> one transpose. XLA sees one fusable concat tree
    instead of transpose -> pad -> slice -> transpose.

Usage: setsid nohup timeout 1800 python scripts/perf_probe_glue.py \
    > /tmp/glueprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.models.swin3d import roll3d, window_partition, window_reverse

MICRO = 8
RES = (36, 42, 36)
C = 96
WINDOW = (6, 7, 6)
SHIFT = (3, 3, 3)
DT = jnp.bfloat16


def glue_chain(wins, shift):
    x = window_reverse(wins, WINDOW, RES)
    if any(shift):
        x = roll3d(x, tuple(-s for s in shift))
    return window_partition(x, WINDOW)


def glue_corner(wins, shift):
    """reverse∘roll∘partition as one expression on the 8D window view.

    Per axis (window w, shift s<w): output local index i reads input local
    (i+s) % w from grid cell g + (i+s)//w (cyclic). So: roll the GRID dims
    (outer-axis concat — large contiguous chunks), slice each local axis at
    w-s, and concatenate the 2^3 corner pieces along the local dims. All
    ops are slice/concat/reshape/transpose on the same 8D view -> one
    fusable tree, no intermediate spatial materialization.
    """
    b = wins.shape[0] // int(
        np.prod([r // w for r, w in zip(RES, WINDOW)])
    )
    gd, gh, gw = (r // w for r, w in zip(RES, WINDOW))
    wd, wh, ww = WINDOW
    x = wins.reshape(b, gd, gh, gw, wd, wh, ww, C)

    def axis_pieces(v, grid_ax, loc_ax, w, s):
        if s == 0:
            return v
        # grid-rolled copy for the wrapped upper piece
        up = jnp.concatenate(
            (jax.lax.slice_in_dim(v, 1, v.shape[grid_ax], axis=grid_ax),
             jax.lax.slice_in_dim(v, 0, 1, axis=grid_ax)), axis=grid_ax)
        lo = jax.lax.slice_in_dim(v, s, w, axis=loc_ax)       # i = 0..w-s-1
        hi = jax.lax.slice_in_dim(up, 0, s, axis=loc_ax)      # i = w-s..w-1
        return jnp.concatenate((lo, hi), axis=loc_ax)

    sz, sy, sx = shift
    x = axis_pieces(x, 1, 4, wd, sz % wd)
    x = axis_pieces(x, 2, 5, wh, sy % wh)
    x = axis_pieces(x, 3, 6, ww, sx % ww)
    return x.reshape(-1, wd * wh * ww, C)


def timeit(name, fn, arg, n=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(arg)
        _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(arg)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    print(f"{name:14s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)


def check():
    rng = np.random.default_rng(0)
    wins = jnp.asarray(rng.standard_normal(
        (2 * 6 * 6 * 6, int(np.prod(WINDOW)), C)), jnp.float32)
    want = np.asarray(jax.jit(lambda v: glue_chain(v, SHIFT))(wins))
    got = np.asarray(jax.jit(lambda v: glue_corner(v, SHIFT))(wins))
    np.testing.assert_allclose(got, want)
    print("correctness ok", flush=True)


def main():
    check()
    if "--check-only" in sys.argv:
        return
    rng = np.random.default_rng(0)
    nwin = int(np.prod([r // w for r, w in zip(RES, WINDOW)]))
    wins = jnp.asarray(
        rng.standard_normal((MICRO * nwin, int(np.prod(WINDOW)), C)), DT)
    timeit("glue_chain0", lambda v: glue_chain(v, (0, 0, 0)), wins)
    timeit("glue_chain", lambda v: glue_chain(v, SHIFT), wins)
    timeit("glue_corner", lambda v: glue_corner(v, SHIFT), wins)
    # backward matters too (the VJP of each is its inverse permutation)
    for name, fn in (("chain", glue_chain), ("corner", glue_corner)):
        g = jax.jit(jax.grad(
            lambda v, fn=fn: fn(v, SHIFT).astype(jnp.float32).sum()))
        timeit(f"grad_{name}", g, wins, n=6)


if __name__ == "__main__":
    main()
