"""Isolate the C_in=1 stem-conv cost and the Pallas im2col fix.

perf_probe_medvit_resnet.py measured the ResNet-18 7x7x7 stride-(1,2,2)
stem at 209 ms fwd+bwd (micro 8) — ~60% of its whole train step — and the
MedViT 3x3x3 stride-2 stem0 similarly hot; the forward alone is 154.5 ms
(306 GFLOP at ~2 TFLOP/s = the MXU contracting K=C_in=1). This probe
compares the plain conv against vsn_tpu/ops/stem_im2col.stem_conv_im2col
for fwd / input-grad / filter-grad / full, asserting numeric parity on
the first call. (The earlier XLA tap-unfold variant compile-OOMs at this
geometry — conv_unfold.py docstring — and is no longer probed here.)

In the train step only fwd + dw matter: the stem is the first layer, so
its dx (which the im2col path routes through the plain XLA conv VJP) is
dead code there.

Usage: setsid nohup timeout 1500 python scripts/perf_probe_stem.py \
    > /tmp/stemprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.ops.stem_im2col import stem_conv_im2col

MICRO = 8
DT = jnp.bfloat16


def timeit(name, fn, n=6, warmup=2):
    for _ in range(warmup):
        out = fn()
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    print(f"{name:20s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def conv_fn(w, x, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[(p, p) for p in pad],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def im2col_fn(w, x, stride, pad):
    return stem_conv_im2col(x, w, stride, pad)


def probe(name, kshape, stride, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((MICRO, 144, 168, 144, kshape[3])), DT)
    w = jnp.asarray(rng.standard_normal(kshape) * 0.05, DT)

    # parity gate before timing: fused kernel vs XLA conv on this chip
    ref = jax.jit(lambda: conv_fn(w, x, stride, pad))()
    got = jax.jit(lambda: im2col_fn(w, x, stride, pad))()
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    s = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"{name} im2col-vs-conv max|d| {d:.3e} (scale {s:.3e})",
          flush=True)
    assert d <= 2e-2 * max(s, 1.0), f"{name} PARITY FAIL: {d} vs {s}"

    for tag, fn in (("conv", conv_fn), ("im2col", im2col_fn)):
        f = lambda ww, xx: fn(ww, xx, stride, pad)
        fwd = jax.jit(lambda ww, xx: f(ww, xx).astype(jnp.float32).sum())
        timeit(f"{name}_{tag}_fwd", lambda: fwd(w, x))
        dx = jax.jit(jax.grad(
            lambda xx: f(jax.lax.stop_gradient(w), xx)
            .astype(jnp.float32).sum()))
        timeit(f"{name}_{tag}_dx", lambda: dx(x), n=4)
        dw = jax.jit(jax.grad(
            lambda ww: f(ww, jax.lax.stop_gradient(x))
            .astype(jnp.float32).sum()))
        timeit(f"{name}_{tag}_dw", lambda: dw(w), n=4)
        full = jax.jit(jax.grad(
            lambda ww, xx: f(ww, xx).astype(jnp.float32).sum(),
            argnums=(0, 1)))
        timeit(f"{name}_{tag}_full", lambda: full(w, x), n=4)


def probe_depthwise(name, spatial, c):
    """Depthwise 3^3 stride-1: lax grouped conv vs shift-FMA form, at the
    MedViT stage-0 LFF shape (hidden = 4x96 = 384 over the /4 grid)."""
    from vsn_tpu.ops.conv_unfold import depthwise_conv3d_shift

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((MICRO, *spatial, c)), DT)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)) * 0.05, DT)

    def grouped(ww, xx):
        return jax.lax.conv_general_dilated(
            xx, ww, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c)

    def shift(ww, xx):
        return depthwise_conv3d_shift(xx, ww)

    for tag, fn in (("grp", grouped), ("shift", shift)):
        # pass operands as jit ARGUMENTS: a nullary closure bakes the
        # 320 MB input into the MLIR as a constant literal and the
        # remote-compile RPC rejects the body with HTTP 413
        fwd = jax.jit(lambda ww, xx, fn=fn: fn(ww, xx)
                      .astype(jnp.float32).sum())
        timeit(f"{name}_{tag}_fwd", lambda: fwd(w, x))
        full = jax.jit(jax.grad(
            lambda ww, xx, fn=fn: fn(ww, xx).astype(jnp.float32).sum(),
            argnums=(0, 1)))
        timeit(f"{name}_{tag}_full", lambda: full(w, x), n=4)


def main():
    which = sys.argv[1:] or ["resnet", "medvit", "dw"]
    if "resnet" in which:
        probe("rn7", (7, 7, 7, 1, 64), (1, 2, 2), (3, 3, 3))
    if "medvit" in which:
        probe("mv3", (3, 3, 3, 1, 64), (2, 2, 2), (1, 1, 1))
    if "dw" in which:
        probe_depthwise("dw384", (36, 42, 36), 384)


if __name__ == "__main__":
    main()
