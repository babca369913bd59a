"""Second ablation round: grid/DMA overhead vs compute in the stage-1 kernel.

  copy_only      out = x, no other operands
  copy_ops       out = x, all operands declared but unused
  lin2d_wb8      LN+qkv+proj at 8 windows/program, unrolled 2D slices
  full2d_wb8     full kernel at 8 windows/program, unrolled 2D slices
  full2d_wb8_f32 same but f32 x/out blocks
  copy_only_wb8  out = x at 8 windows/program

Usage: timeout 590 python scripts/perf_probe_attn_ablate2.py
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
    print(f"{name:16s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def xspec(wb):
    return pl.BlockSpec((wb, N, C), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def blk(shape):
    return pl.BlockSpec(shape, lambda bi: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def copy_kernel(x_ref, out_ref):
    out_ref[...] = x_ref[...]


def copy_ops_kernel(x_ref, wqkv_ref, bias_ref, wproj_ref, out_ref):
    out_ref[...] = x_ref[...]


def slot_kernel(x_ref, wqkv_ref, bias_ref, wproj_ref, out_ref, *, wb,
                variant):
    for s in range(wb):
        x = x_ref[s].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + 1e-5)
        qkv = jax.lax.dot_general(
            y.astype(jnp.bfloat16), wqkv_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if variant == "lin":
            ao = qkv[:, :C]
        else:
            outs = []
            for h in range(HEADS):
                q = qkv[:, h * D:(h + 1) * D].astype(jnp.bfloat16)
                k = qkv[:, C + h * D:C + (h + 1) * D].astype(jnp.bfloat16)
                v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D].astype(
                    jnp.bfloat16
                )
                sarr = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * SCALE
                sarr = sarr + bias_ref[h]
                sarr = sarr - jnp.max(sarr, axis=-1, keepdims=True)
                p = jnp.exp(sarr)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                outs.append(
                    jax.lax.dot_general(
                        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            ao = jnp.concatenate(outs, axis=-1)
        branch = jax.lax.dot_general(
            ao.astype(jnp.bfloat16), wproj_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[s] = (x + branch).astype(out_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    from vsn_tpu.models.swin3d import window_partition

    x5 = jnp.asarray(
        rng.standard_normal((MICRO, 36, 42, 36, C)), jnp.bfloat16
    )
    xw = window_partition(x5, WINDOW)
    bw = xw.shape[0]
    xw32 = xw.astype(jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)

    f = pl.pallas_call(copy_kernel, grid=(bw,), in_specs=[xspec(1)],
                       out_specs=xspec(1),
                       out_shape=jax.ShapeDtypeStruct(xw.shape, xw.dtype),
                       compiler_params=CP)
    jf = jax.jit(f)
    timeit("copy_only", lambda: jf(xw))

    f = pl.pallas_call(
        copy_ops_kernel, grid=(bw,),
        in_specs=[xspec(1), blk((C, 3 * C)), blk((HEADS, N, N)),
                  blk((C, C))],
        out_specs=xspec(1),
        out_shape=jax.ShapeDtypeStruct(xw.shape, xw.dtype),
        compiler_params=CP)
    jf2 = jax.jit(lambda a: f(a, wqkv, bias, wproj))
    timeit("copy_ops", lambda: jf2(xw))

    f = pl.pallas_call(copy_kernel, grid=(bw // 8,), in_specs=[xspec(8)],
                       out_specs=xspec(8),
                       out_shape=jax.ShapeDtypeStruct(xw.shape, xw.dtype),
                       compiler_params=CP)
    jf3 = jax.jit(f)
    timeit("copy_only_wb8", lambda: jf3(xw))

    def build_slot(wb, variant, xin):
        f = pl.pallas_call(
            functools.partial(slot_kernel, wb=wb, variant=variant),
            grid=(bw // wb,),
            in_specs=[xspec(wb), blk((C, 3 * C)), blk((HEADS, N, N)),
                      blk((C, C))],
            out_specs=xspec(wb),
            out_shape=jax.ShapeDtypeStruct(xin.shape, xin.dtype),
            compiler_params=CP)
        jfx = jax.jit(lambda a: f(a, wqkv, bias, wproj))
        return lambda: jfx(xin)

    timeit("lin2d_wb8", build_slot(8, "lin", xw))
    timeit("full2d_wb8", build_slot(8, "full", xw))
    timeit("full2d_wb8_f32", build_slot(8, "full", xw32))
    timeit("full2d_wb1", build_slot(1, "full", xw))


if __name__ == "__main__":
    main()
