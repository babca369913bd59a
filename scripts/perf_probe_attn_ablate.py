"""In-kernel ablation of the stage-1 fused attention half (fwd only, wb=1).

Self-contained kernel variants isolate where the 9.9 ms goes:
  full2d       old-style 2D per-window kernel (no batch dims)
  noln         LN replaced by identity
  nosm         softmax replaced by scale (keeps both matmuls)
  nobias       bias+mask adds skipped
  linear_only  qkv+proj matmuls only (attention inner loop skipped)
  attn_only    per-head attention only (no LN/qkv/proj; q=k=v slices of x)

Usage: timeout 590 python scripts/perf_probe_attn_ablate.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MICRO = 8
WINDOW = (6, 7, 6)
C, HEADS = 96, 3
N = WINDOW[0] * WINDOW[1] * WINDOW[2]
D = C // HEADS
SCALE = D**-0.5
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


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
    print(f"{name:14s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def kernel(x_ref, wqkv_ref, bias_ref, wproj_ref, out_ref, *, variant):
    x = x_ref[0].astype(jnp.float32)                       # [N, C]
    if variant == "noln":
        y = x
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + 1e-5)
    if variant == "attn_only":
        qkv = jnp.concatenate([y, y, y], axis=-1)
    else:
        qkv = jax.lax.dot_general(
            y.astype(jnp.bfloat16), wqkv_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    if variant == "linear_only":
        ao = qkv[:, :C]
    else:
        outs = []
        for h in range(HEADS):
            q = qkv[:, h * D:(h + 1) * D].astype(jnp.bfloat16)
            k = qkv[:, C + h * D:C + (h + 1) * D].astype(jnp.bfloat16)
            v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * SCALE
            if variant != "nobias":
                s = s + bias_ref[h]
            if variant == "nosm":
                p = s * 0.001
            else:
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        ao = jnp.concatenate(outs, axis=-1)
    if variant == "attn_only":
        branch = ao
    else:
        branch = jax.lax.dot_general(
            ao.astype(jnp.bfloat16), wproj_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    out_ref[0] = (x + branch).astype(out_ref.dtype)


def build(variant, xw, wqkv, bias, wproj):
    bw = xw.shape[0]
    blk = lambda shape: pl.BlockSpec(
        shape, lambda bi: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xs = pl.BlockSpec((1, N, C), lambda bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(bw,),
        in_specs=[xs, blk((C, 3 * C)), blk((HEADS, N, N)), blk((C, C))],
        out_specs=xs,
        out_shape=jax.ShapeDtypeStruct(xw.shape, xw.dtype),
        compiler_params=CP,
    )
    jf = jax.jit(lambda a: f(a, wqkv, bias, wproj))
    return lambda: jf(xw)


def main():
    rng = np.random.default_rng(0)
    from vsn_tpu.models.swin3d import window_partition

    x5 = jnp.asarray(
        rng.standard_normal((MICRO, 36, 42, 36, C)), jnp.bfloat16
    )
    xw = window_partition(x5, WINDOW)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    bias = jnp.asarray(
        rng.standard_normal((HEADS, N, N)) * 0.1, jnp.float32
    )
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)

    for variant in ("full2d", "noln", "nosm", "nobias", "linear_only",
                    "attn_only"):
        timeit(variant, build(variant, xw, wqkv, bias, wproj))


if __name__ == "__main__":
    main()
