"""A/B the patch-embed formulations on chip at production geometry.

Targets the 2026-08-19 trace block: input-layout copy 14.8 ms + conv fwd
11.1 ms + conv dW 10.4 ms for [8,144,168,144,1] -> [8,36,42,36,96].

Variants:
  conv3d  — nn.Conv's 3D patchify conv (current default)
  zconv   — NCHW conv2d with the kd z-taps folded into C_in via a
            leading-dim split (models/swin3d._PatchEmbedZConv)

Usage: setsid nohup timeout 3600 python scripts/perf_probe_embed.py \
    > /tmp/q_embed.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, D, H, W = 8, 144, 168, 144
KP = (4, 4, 4)
E = 96
DT = jnp.bfloat16


def conv3d_fwd(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x.astype(DT), kernel.astype(DT), window_strides=KP,
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias.astype(DT)


def zconv_fwd(x, kernel, bias):
    b, d, h, w, _ = x.shape
    kd, kh, kw = KP
    lhs = x.reshape(b * (d // kd), kd, h, w)
    rhs = kernel[:, :, :, 0, :].transpose(1, 2, 0, 3)
    y = jax.lax.conv_general_dilated(
        lhs.astype(DT), rhs.astype(DT), window_strides=(kh, kw),
        padding="VALID", dimension_numbers=("NCHW", "HWIO", "NHWC"),
    )
    y = y + bias.astype(DT)
    return y.reshape(b, d // kd, h // kh, w // kw, E)


def timed(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D, H, W, 1)), DT)
    kernel = jnp.asarray(rng.standard_normal((*KP, 1, E)) * 0.02,
                         jnp.float32)
    bias = jnp.zeros((E,), jnp.float32)

    f_conv = jax.jit(conv3d_fwd)
    f_z = jax.jit(zconv_fwd)
    a = np.asarray(f_conv(x, kernel, bias), np.float32)
    bz = np.asarray(f_z(x, kernel, bias), np.float32)
    print("fwd parity max|d|", float(np.abs(a - bz).max()), flush=True)

    def grads(fwd):
        def loss(k, b2):
            y = fwd(x, k, b2).astype(jnp.float32)
            return jnp.sum(y * y)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    g_conv, g_z = grads(conv3d_fwd), grads(zconv_fwd)
    ga = g_conv(kernel, bias)
    gb = g_z(kernel, bias)
    print("dW parity max|d|",
          float(jnp.abs(ga[0] - gb[0]).max()),
          "rel", float(jnp.abs(ga[0] - gb[0]).max() /
                       (jnp.abs(ga[0]).max() + 1e-9)), flush=True)

    for name, fn, args in [
        ("conv3d_fwd", f_conv, (x, kernel, bias)),
        ("zconv_fwd", f_z, (x, kernel, bias)),
        ("conv3d_grad", g_conv, (kernel, bias)),
        ("zconv_grad", g_z, (kernel, bias)),
    ]:
        print(f"{name:24s} {timed(fn, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
