"""Small-step factorial probe: isolate what makes the full train step slow.

Runs the Swin-5c train step at micro 8 with small accum counts, Pallas
on/off, SAM on/off — small uploads and compiles, fetch-based syncing.

Usage:
  setsid nohup python scripts/perf_probe_step.py > /tmp/stepprobe.log 2>&1 &
Env: VSN_PROBE_CASES="pallas_a2,xla_a2,pallas_a2_sam,pallas_a8" (default all)
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
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    init_train_state, make_batch_transform, make_train_step,
)

CASES = {
    # name: (accum, pallas, sam, extra overrides)
    "pallas_a2": (2, True, False, {}),
    "xla_a2": (2, False, False, {}),
    "pallas_a2_sam": (2, True, True, {}),
    "pallas_a8": (8, True, False, {}),
    "pallas_a16": (16, True, False, {}),
    "pallas_a16_sam": (16, True, True, {}),
    "pallas_a16_full": (16, True, True, dict(
        USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1,
    )),
    "pallas_a8_full": (8, True, True, dict(
        USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1,
    )),
    # micro 16: earlier design spilled HBM (4.4 vol/s); fused-kernel VJPs
    # recompute activations, so retry
    "pallas_m64a2_full": (2, True, True, dict(
        USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, BATCH_SIZE=64,
        EFFECTIVE_BATCH_SIZE=128,
    )),
    "pallas_m32a4_full": (4, True, True, dict(
        USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, BATCH_SIZE=32,
        EFFECTIVE_BATCH_SIZE=128,
    )),
    "pallas_m16a8_full": (8, True, True, dict(
        USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, BATCH_SIZE=16,
        EFFECTIVE_BATCH_SIZE=128,
    )),
}


def run_case(name, accum, pallas, sam, extra):
    micro = int(extra.get("BATCH_SIZE", 8))
    overrides = dict(
        SEED=0, USE_SAM=sam, USE_EMA=False, USE_MIXUP=False,
        USE_SHAKEDROP=False, BATCH_SIZE=micro,
        EFFECTIVE_BATCH_SIZE=accum * micro,
        USE_PALLAS_ATTENTION=pallas,
    )
    overrides.update(extra)
    cfg = load_config(
        override_path="vsn_tpu/configs/swin-5c-no_seed-baseline.yaml",
        extra_overrides=overrides,
    )
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *cfg.input_size, 1), jnp.float32),
        True,
    )
    state = init_train_state(cfg, variables)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    k = cfg.num_classes
    batch = {
        "image": rng.standard_normal(
            (accum, micro, *cfg.input_size, 1)
        ).astype(np.float16),
        "label": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (accum, micro))
        ],
    }
    if cfg.get("USE_MIXUP", False) or cfg.get("USE_CUTMIX", False):
        batch.update({
            "image2": rng.standard_normal(
                (accum, micro, *cfg.input_size, 1)
            ).astype(np.float16),
            "label2": np.eye(k, dtype=np.float32)[
                rng.integers(0, k, (accum, micro))
            ],
            "mix_lam": rng.beta(0.3, 0.3, (accum, micro)).astype(np.float32),
            "mix_apply": rng.random((accum, micro)) < 0.5,
            "mix_bounds": np.zeros((accum, micro, 6), np.int32),
        })
    batch = jax.device_put(batch)
    base = jax.random.key(0)
    t0 = time.perf_counter()
    state, m = step(state, batch, base)
    _ = float(jnp.asarray(m["loss"]))
    print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    state, m = step(state, batch, base)
    _ = float(jnp.asarray(m["loss"]))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        state, m = step(state, batch, base)
    _ = float(jnp.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    vols = accum * micro
    print(f"[{name}] step {dt * 1e3:8.0f} ms  {vols / dt:7.2f} vol/s "
          f"({dt / vols * 1e3:.0f} ms/vol)", flush=True)


def main():
    names = os.environ.get("VSN_PROBE_CASES", ",".join(CASES)).split(",")
    for nm in names:
        nm = nm.strip()
        run_case(nm, *CASES[nm])


if __name__ == "__main__":
    main()
