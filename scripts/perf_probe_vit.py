"""Perf probe: where does the ViT-S 3c train step spend its time?

Round-1 measured 10.7 vol/s/chip for ViT-S (plain step) — anomalously low for
810 tokens. This probe times each piece in isolation on the real chip:

  aug        resize+zscore of one accumulation batch [A, B, ...]
  fwd        deterministic forward, one micro-batch
  fwdbwd     value_and_grad, one micro-batch
  embed      patchify (reshape+transpose) + LN + Dense + LN only, fwd+bwd
  blocks     12 transformer blocks at [B, 811, 384], fwd+bwd
  step       the full train step (transform_all + accum scan + AdamW)

Usage (detached): setsid nohup python scripts/perf_probe_vit.py > /tmp/vitprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.config import load_config
from vsn_tpu.models import build_model
from vsn_tpu.train.losses import label_smoothing_loss
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    init_train_state,
    make_batch_transform,
    make_train_step,
)


def timeit(name, fn, n=8, warmup=2, sync=None):
    """Time fn() n times; sync forces a device->host fetch (axon tunnel does
    not honor block_until_ready reliably, CLAUDE.md)."""
    for _ in range(warmup):
        out = fn()
        _ = float(jnp.asarray(sync(out) if sync else out).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.asarray(sync(out) if sync else out).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:12s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    cfg = load_config(
        override_path="vsn_tpu/configs/vit-3c-no_seed-baseline.yaml",
        extra_overrides=dict(SEED=0),
    )
    micro = int(cfg.BATCH_SIZE)           # 24
    accum = cfg.gradient_accumulation_steps(1)
    print(f"micro={micro} accum={accum} input={cfg.input_size}", flush=True)

    model = build_model(cfg)
    rng = np.random.default_rng(0)
    raw_shape = (micro, *cfg.IMG_SIZE, 1)  # cache-sized, pre-resize
    x_raw = jnp.asarray(rng.standard_normal(raw_shape).astype(np.float16))
    x_in = jnp.asarray(
        rng.standard_normal((micro, *cfg.input_size, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = cfg.num_classes
    y = jnp.asarray(np.eye(k, dtype=np.float32)[rng.integers(0, k, micro)])

    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    params = variables["params"]

    # --- aug: minimal transform on one full accumulation batch
    from vsn_tpu.data.augment import build_train_augment
    aug = build_train_augment(cfg)
    batch_raw = jnp.asarray(
        rng.standard_normal((accum, micro, *cfg.IMG_SIZE, 1)).astype(np.float16)
    )

    @jax.jit
    def aug_all(xs):
        return jax.lax.map(lambda x: aug(x, jax.random.key(1)), xs)

    timeit("aug(A,B)", lambda: aug_all(batch_raw), n=4)

    # --- fwd
    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, True)

    timeit("fwd", lambda: fwd(params, x_in), n=8)

    # --- fwd+bwd
    def loss_fn(p, x, yy):
        logits = model.apply(
            {"params": p}, x, False,
            rngs={"dropout": jax.random.key(1), "shakedrop": jax.random.key(2)},
        )
        return label_smoothing_loss(logits, yy, 0.0)

    gfn = jax.jit(jax.value_and_grad(loss_fn))
    timeit("fwdbwd", lambda: gfn(params, x_in, y), n=8,
           sync=lambda o: o[0])

    # --- embed only (patchify path): reshape/transpose + LN + Dense + LN
    pd, ph, pw = cfg.PATCH_SHAPE
    gd, gh, gw = (s // p for s, p in zip(cfg.input_size, cfg.PATCH_SHAPE))
    n_tok = gd * gh * gw
    patch_dim = pd * ph * pw
    w_embed = jnp.zeros((patch_dim, int(cfg.EMBED_DIM)), jnp.bfloat16)

    def embed_fn(w, x):
        b = x.shape[0]
        t = x.reshape(b, gd, pd, gh, ph, gw, pw, 1)
        t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n_tok, patch_dim)
        return (t @ w).astype(jnp.float32).sum()

    gembed = jax.jit(jax.grad(embed_fn, argnums=0))
    timeit("embed", lambda: gembed(w_embed, x_in), n=8)

    # --- blocks only at token resolution
    from vsn_tpu.models.vit3d import ViTBlock

    class Blocks(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x, det=True):
            for i in range(int(cfg.DEPTH)):
                x = ViTBlock(
                    heads=int(cfg.HEADS), dim_head=64,
                    mlp_dim=int(cfg.EMBED_DIM * cfg.MLP_RATIO),
                    dtype=jnp.bfloat16, name=f"b{i}",
                )(x, det)
            return x

    blocks = Blocks()
    tok = jnp.zeros((micro, n_tok + 1, int(cfg.EMBED_DIM)), jnp.bfloat16)
    bvars = blocks.init(jax.random.key(0), tok)

    def bl_loss(p, t):
        return blocks.apply({"params": p}, t, False).astype(jnp.float32).sum()

    gbl = jax.jit(jax.grad(bl_loss))
    timeit("blocks", lambda: gbl(bvars["params"], tok), n=8,
           sync=lambda o: jax.tree.leaves(o)[0])

    # --- full train step
    state = init_train_state(cfg, variables)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )
    batch = {
        "image": np.asarray(batch_raw),
        "label": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (accum, micro))
        ],
    }
    batch = jax.device_put(batch)
    base = jax.random.key(0)

    def run_step():
        nonlocal state
        state, m = step(state, batch, base)
        return m["loss"]

    dt = timeit("step", run_step, n=4, warmup=2)
    print(f"step throughput: {accum * micro / dt:.1f} vol/s", flush=True)


if __name__ == "__main__":
    main()
