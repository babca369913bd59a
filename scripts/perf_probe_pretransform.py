"""Perf probe: pre-transformed resident store vs per-step resize+z-score.

The ViT-S device-resident probe (scripts/perf_probe_vit.py) measured the
deterministic resize+normalize at 44.1 ms of the 410 ms step. With
PRELOAD_PRETRANSFORM the store holds transformed volumes and the step's
batch transform is a passthrough (vsn_tpu/data/resident.py
resident_pretransform) — legal exactly for minimal-pipeline configs with no
mixing, since the reference z-scores AFTER mixing (dataset/dataset.py:
288-291). This times the full ViT-S 3c train step both ways with
device-resident index batches (no host link in the loop, CLAUDE.md
measurement rule).

Usage (detached): setsid nohup python scripts/perf_probe_pretransform.py \
    > /tmp/preprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.config import load_config
from vsn_tpu.data.resident import build_resident, resident_pretransform
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    init_train_state,
    make_batch_transform,
    make_train_step,
)
from vsn_tpu.models import build_model
from vsn_tpu.utils.cache import enable_compile_cache


def time_steps(step, state, batch, res, n=10, warmup=2):
    key = jax.random.key(1)
    for i in range(warmup):
        state, m = step(state, batch, key, res)
    _ = float(jnp.asarray(m["loss"]))  # force sync (tunnel rule)
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, key, res)
    _ = float(jnp.asarray(m["loss"]))
    return (time.perf_counter() - t0) / n, state


def main():
    enable_compile_cache()
    cfg = load_config(
        override_path="vsn_tpu/configs/vit-3c-no_seed-baseline.yaml",
        extra_overrides=dict(SEED=0, PRELOAD_DEVICE="float16"),
    )
    micro = int(cfg.BATCH_SIZE)
    accum = cfg.gradient_accumulation_steps(1)
    eff = micro * accum
    print(f"micro={micro} accum={accum} input={cfg.input_size}", flush=True)

    rng = np.random.default_rng(0)
    n_vols = 64
    vols = (rng.standard_normal((n_vols, *cfg.IMG_SIZE, 1)) * 50 + 100
            ).astype(np.float16)
    k = cfg.num_classes
    batch = {
        "image_idx": rng.integers(0, n_vols, (accum, micro)).astype(np.int32),
        "label": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (accum, micro))],
    }

    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    lr, wd = lr_wd_schedules(cfg)

    # raw store + per-step transform
    res_raw = build_resident(vols, "float16")
    step_raw = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )
    dt_raw, _ = time_steps(step_raw, init_train_state(cfg, variables),
                           batch, res_raw)
    print(f"raw store + per-step transform: {dt_raw * 1e3:8.1f} ms/step "
          f"({eff / dt_raw:6.1f} vol/s)", flush=True)

    # pre-transformed store + passthrough. Fresh init: the first timed run
    # DONATED (and deleted) the buffers inside `variables` — reusing them
    # here would crash on TPU with "Array has been deleted".
    variables2 = model.init(jax.random.key(0), x0, True)
    tfm = resident_pretransform(cfg, train=True)
    assert tfm is not None, "config must be minimal/no-mix for this probe"
    res_pre = build_resident(vols, "float16", pretransform=tfm)
    step_pre = jax.jit(
        make_train_step(model, cfg, lr, wd, None),
        donate_argnums=(0,),
    )
    dt_pre, _ = time_steps(step_pre, init_train_state(cfg, variables2),
                           batch, res_pre)
    print(f"pre-transformed store:          {dt_pre * 1e3:8.1f} ms/step "
          f"({eff / dt_pre:6.1f} vol/s)", flush=True)
    print(f"speedup: {dt_raw / dt_pre:.3f}x", flush=True)


if __name__ == "__main__":
    main()
