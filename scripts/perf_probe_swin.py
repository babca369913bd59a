"""Swin-T stage/op ablation on the real chip: where do the 82 ms (bs4
fwd+bwd) actually go?

Times, at micro-batch 8 bf16 (train-mode shapes for the bench config):
  full        whole Swin-T fwd+bwd
  embed       Conv3d patch embed fwd+bwd
  stage{i}    one BasicLayer3D at its natural resolution (incl. merge)
  s1_attnblk  stage-1 attention-only block path (norm+roll+partition+attn+
              reverse) vs
  s1_mlp      stage-1 LN+MLP only
  s1_roll     roll(+shift)+roll(-shift) round trip
  s1_part     window partition+reverse round trip

Usage: setsid nohup python scripts/perf_probe_swin.py > /tmp/swinprobe.log 2>&1 &
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsn_tpu.models.swin3d import (
    BasicLayer3D,
    window_partition,
    window_reverse,
)

MICRO = 8
WINDOW = (6, 7, 6)
DT = jnp.bfloat16
STAGES = [
    # (resolution, channels, depth, heads, downsample)
    ((36, 42, 36), 96, 2, 3, True),
    ((18, 21, 18), 192, 2, 6, True),
    ((9, 11, 9), 384, 6, 12, True),
    ((5, 6, 5), 768, 2, 24, False),
]


def timeit(name, fn, n=8, warmup=2, sync=None):
    for _ in range(warmup):
        out = fn()
        _ = float(jnp.asarray((sync(out) if sync else out)).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.asarray((sync(out) if sync else out)).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:12s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def grad_time(name, module, x, n=8):
    variables = module.init(jax.random.key(0), x, True)

    def loss(p, xx):
        return module.apply({"params": p}, xx, True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    timeit(name, lambda: g(variables["params"], x), n=n,
           sync=lambda o: jax.tree.leaves(o)[0])


class StageModule(nn.Module):
    cfg: tuple

    @nn.compact
    def __call__(self, x, deterministic=True):
        _, c, depth, heads, down = self.cfg
        return BasicLayer3D(
            depth=depth, num_heads=heads, window=WINDOW,
            drop_path_rates=[0.0] * depth, downsample=down,
            use_pallas=True, dtype=DT, name="layer",
        )(x, deterministic)


def main():
    rng = np.random.default_rng(0)

    # stage-1 micro ops first: smallest compiles, the actionable data
    res, c = (36, 42, 36), 96
    x1 = jnp.asarray(rng.standard_normal((MICRO, *res, c)), DT)

    def roll_fn(xx):
        r = jnp.roll(xx, shift=(-3, -3, -3), axis=(1, 2, 3))
        return jnp.roll(r, shift=(3, 3, 3), axis=(1, 2, 3)).astype(
            jnp.float32).sum()

    roll_g = jax.jit(jax.grad(roll_fn))
    timeit("s1_roll", lambda: roll_g(x1), n=8)

    def part_fn(xx):
        w = window_partition(xx, WINDOW)
        return window_reverse(w * 1.000001, WINDOW, res).astype(
            jnp.float32).sum()

    part_g = jax.jit(jax.grad(part_fn))
    timeit("s1_part", lambda: part_g(x1), n=8)

    class MlpBlock(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            from vsn_tpu.models.layers import Mlp
            h = nn.LayerNorm(dtype=DT)(xx)
            return xx + Mlp(hidden_features=4 * c, dtype=DT)(h, deterministic)

    grad_time("s1_mlp", MlpBlock(), x1)

    class AttnBlock(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            from vsn_tpu.models.swin3d import SwinBlock3D
            # attention half only: mlp_ratio tiny to isolate? keep full block
            return SwinBlock3D(
                num_heads=3, window=WINDOW, shift=(3, 3, 3),
                use_pallas=True, dtype=DT, name="blk",
            )(xx, None, deterministic)

    grad_time("s1_block_sh", AttnBlock(), x1)

    # PatchMerging alone (stage-1 output shape) — crash suspect
    class MergeOnly(nn.Module):
        @nn.compact
        def __call__(self, xx, deterministic=True):
            from vsn_tpu.models.swin3d import PatchMerging3D
            return PatchMerging3D(dtype=DT, name="merge")(xx)

    x1m = jnp.asarray(rng.standard_normal((MICRO, 36, 42, 36, 96)), DT)
    grad_time("s1_merge", MergeOnly(), x1m, n=8)

    # stages 2-4 first; stage1 has crashed the worker — keep it last
    for i, st in list(enumerate(STAGES))[1:] + [(0, STAGES[0])]:
        sres, sc, depth, heads, down = st
        x = jnp.asarray(rng.standard_normal((MICRO, *sres, sc)), DT)
        grad_time(f"stage{i + 1}", StageModule(cfg=st), x, n=6)

    # full model last (largest compile; a worker crash here keeps the rest)
    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model

    cfg = load_config(
        override_path="vsn_tpu/configs/swin-5c-no_seed-baseline.yaml",
        extra_overrides=dict(SEED=0),
    )
    model = build_model(cfg)
    x_full = jnp.asarray(
        rng.standard_normal((MICRO, *cfg.input_size, 1)), DT
    )
    grad_time("full", model, x_full, n=4)


if __name__ == "__main__":
    main()
