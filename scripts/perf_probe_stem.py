"""Isolate the C_in=1 stem-conv cost: fwd vs input-grad vs filter-grad.

perf_probe_medvit_resnet.py measured the ResNet-18 7x7x7 stride-(1,2,2)
stem at 209 ms fwd+bwd (micro 8) — ~60% of its whole train step — and the
MedViT 3x3x3 stride-2 stem0 similarly hot. This probe splits the cost:

  fwd         conv forward only
  dx_only     grad wrt input, filter stopped
  dw_only     grad wrt filter, input is a constant
  full        both grads

Variants: resnet stem conv, medvit stem0 conv, swin patch-embed conv.

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
    print(f"{name:16s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def conv_fn(w, x, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def probe(name, kshape, stride, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((MICRO, 144, 168, 144, 1)), DT)
    w = jnp.asarray(rng.standard_normal(kshape) * 0.05, DT)

    timeit(f"{name}_fwd", jax.jit(lambda: conv_fn(w, x, stride, pad).sum()))
    timeit(f"{name}_dx", jax.jit(jax.grad(
        lambda xx: conv_fn(jax.lax.stop_gradient(w), xx, stride, pad)
        .sum().astype(jnp.float32))), n=4)
    timeit(f"{name}_dw", jax.jit(jax.grad(
        lambda ww: conv_fn(ww, jax.lax.stop_gradient(x), stride, pad)
        .sum().astype(jnp.float32))), n=4)


def main():
    which = sys.argv[1:] or ["resnet", "medvit"]
    if "resnet" in which:
        probe("rn7", (7, 7, 7, 1, 64), (1, 2, 2), [(3, 3)] * 3)
    if "medvit" in which:
        probe("mv3", (3, 3, 3, 1, 64), (2, 2, 2), [(1, 1)] * 3)


if __name__ == "__main__":
    main()
