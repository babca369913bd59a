"""Fused-kernel stage probe: attn-half + MLP-half + full Swin-T fwd+bwd.

Times each fused half-block at every stage geometry (micro 8, Swin-T,
144x168x144, window (6,7,6)) plus the whole model, to track kernel
optimizations (window batching, stage-3 padding). VSN_ATTN_WB overrides the
window batch for sweeps.

Usage: setsid nohup python scripts/perf_probe_fused.py > /tmp/fusedprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

MICRO = int(os.environ.get("VSN_PROBE_MICRO", "8"))
WINDOW = (6, 7, 6)
DT = jnp.bfloat16
# (name, padded resolution, channels, heads, shifted)
CASES = [
    ("s1", (36, 42, 36), 96, 3),
    ("s2", (18, 21, 18), 192, 6),
    ("s3", (12, 14, 12), 384, 12),
    ("s4", (5, 6, 5), 768, 24),
]


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


def grad_time(name, module, x, n=6):
    variables = module.init(jax.random.key(0), x, True)

    def loss(p, xx):
        return module.apply({"params": p}, xx, True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    timeit(name, lambda: g(variables["params"], x), n=n)


def main():
    rng = np.random.default_rng(0)
    from vsn_tpu.models.swin3d import SwinBlock3D, clamp_window

    for sname, res, c, heads in CASES:
        if os.environ.get("VSN_PROBE_STAGE") and (
            sname not in os.environ["VSN_PROBE_STAGE"].split(",")
        ):
            continue
        window, shift = clamp_window(res, WINDOW, tuple(w // 2 for w in WINDOW))
        x = jnp.asarray(rng.standard_normal((MICRO, *res, c)), DT)

        class Block(nn.Module):
            shifted: bool

            @nn.compact
            def __call__(self, xx, deterministic=True):
                from vsn_tpu.models.swin3d import shifted_window_region_ids

                sh = shift if self.shifted else (0, 0, 0)
                ids = (
                    jnp.asarray(
                        shifted_window_region_ids(res, window, shift)
                    ) if self.shifted else None
                )
                return SwinBlock3D(
                    num_heads=heads, window=window, shift=sh,
                    use_pallas=True, dtype=DT, name="blk",
                )(xx, ids, deterministic)

        grad_time(f"{sname}_blk_ns", Block(shifted=False), x)
        if any(s > 0 for s in shift):
            grad_time(f"{sname}_blk_sh", Block(shifted=True), x)

    if os.environ.get("VSN_PROBE_STAGE"):
        return
    from vsn_tpu.models.swin3d import SwinTransformer3D

    model = SwinTransformer3D(
        patch_size=(4, 4, 4), num_classes=5, embed_dim=96,
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_size=WINDOW, use_pallas=True, dtype=DT,
    )
    xf = jnp.asarray(
        rng.standard_normal((MICRO, 144, 168, 144, 1)), DT
    )
    grad_time("full_model", model, xf, n=4)


if __name__ == "__main__":
    main()
