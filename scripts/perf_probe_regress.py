"""Diagnose the bench regression: 26.6 -> 1.46 vol/s/chip.

Ordered least->most risky (stage1 BasicLayer grad has crashed the worker):
  0. platform string (the Pallas gate tests platform == "tpu")
  1. full Swin-T fwd+bwd at micro 8 (expected ~150 ms if healthy)
  2. minimal train step, no SAM/EMA/MixUp, accum 16 x micro 8
     (expected ~16 x 150 ms ~ 2.4 s)
  3. stage1 XLA path (use_pallas=False)
  4. stage1 Pallas path  <- crashes the worker; keep last

Usage: setsid nohup python scripts/perf_probe_regress.py > /tmp/regress.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

MICRO = 8
DT = jnp.bfloat16


def fetch(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def timeit(name, fn, n=4, warmup=1):
    for _ in range(warmup):
        out = fn()
        fetch(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:16s} {dt * 1e3:10.1f} ms", flush=True)
    return dt


def grad_time(name, module, x, n=4):
    variables = module.init(jax.random.key(0), x, True)

    def loss(p, xx):
        return module.apply({"params": p}, xx, True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    timeit(name, lambda: g(variables["params"], x), n=n)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model

    rng = np.random.default_rng(0)

    # 1. full model fwd+bwd
    cfg = load_config(
        override_path="vsn_tpu/configs/swin-5c-no_seed-baseline.yaml",
        extra_overrides=dict(SEED=0),
    )
    model = build_model(cfg)
    x_full = jnp.asarray(rng.standard_normal((MICRO, *cfg.input_size, 1)), DT)
    grad_time("full_fwdbwd", model, x_full, n=4)

    # 2. minimal train step (no SAM/EMA/MixUp), accum 16 x micro 8
    from vsn_tpu.train.schedules import lr_wd_schedules
    from vsn_tpu.train.step import (
        init_train_state, make_batch_transform, make_train_step,
    )

    cfg2 = load_config(
        override_path="vsn_tpu/configs/swin-5c-no_seed-baseline.yaml",
        extra_overrides=dict(
            SEED=0, USE_SAM=False, USE_EMA=False, USE_MIXUP=False,
            USE_SHAKEDROP=False, BATCH_SIZE=8, EFFECTIVE_BATCH_SIZE=128,
        ),
    )
    model2 = build_model(cfg2)
    variables = model2.init(
        jax.random.key(0), jnp.zeros((1, *cfg2.input_size, 1), jnp.float32),
        True,
    )
    state = init_train_state(cfg2, variables)
    lr, wd = lr_wd_schedules(cfg2)
    step = jax.jit(
        make_train_step(model2, cfg2, lr, wd, make_batch_transform(cfg2)),
        donate_argnums=(0,),
    )
    accum = cfg2.gradient_accumulation_steps(1)
    k = cfg2.num_classes
    batch = {
        "image": jax.device_put(
            rng.standard_normal(
                (accum, MICRO, *cfg2.input_size, 1)
            ).astype(np.float16)
        ),
        "label": jax.device_put(
            np.eye(k, dtype=np.float32)[rng.integers(0, k, (accum, MICRO))]
        ),
    }
    base = jax.random.key(0)

    def run():
        nonlocal state
        state, m = step(state, batch, base)
        return m["loss"]

    dt = timeit("plain_step", run, n=3, warmup=1)
    print(f"  -> {accum * MICRO / dt:.1f} vol/s (no SAM; SAM ~ half)",
          flush=True)

    # 3/4. stage1 in isolation, XLA first, Pallas last (crash risk)
    from vsn_tpu.models.swin3d import BasicLayer3D

    class Stage1(nn.Module):
        pallas: bool

        @nn.compact
        def __call__(self, x, deterministic=True):
            return BasicLayer3D(
                depth=2, num_heads=3, window=(6, 7, 6),
                drop_path_rates=[0.0, 0.0], downsample=True,
                use_pallas=self.pallas, dtype=DT, name="layer",
            )(x, deterministic)

    x1 = jnp.asarray(rng.standard_normal((MICRO, 36, 42, 36, 96)), DT)
    grad_time("stage1_xla", Stage1(pallas=False), x1, n=4)
    grad_time("stage1_pallas", Stage1(pallas=True), x1, n=4)


if __name__ == "__main__":
    main()
