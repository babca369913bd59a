"""Per-architecture train-step throughput, device-resident batches.

Measures the BASELINE.json harness configs the way the chip actually runs
them: the full jitted train step (on-device augmentation + grad-accum scan +
optimizer, plus SAM/EMA/MixUp where the config enables them) over a batch
already in HBM. Host->device transfer is excluded on purpose — the axon
tunnel moves ~4 MB/s (scripts/perf_probe_xfer.py) and would swamp the
measurement; see BASELINE.md.

Usage:
  setsid nohup python scripts/perf_probe_arch.py resnet-5c medvit-5c \
      > /tmp/archprobe.log 2>&1 &
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
    init_train_state,
    make_batch_transform,
    make_train_step,
)

HARNESS_OVERRIDES = {
    # BASELINE.json harness configs 2-4
    "resnet-5c": dict(USE_BALANCED_SAMPLER=True, USE_SAM=False, USE_EMA=False),
    "medvit-5c": dict(USE_MIXUP=True, MIXUP_PROB=0.5, LABEL_SMOOTHING=0.1,
                      USE_BALANCED_SAMPLER=True),
    "swin-5c": dict(USE_SAM=True, USE_EMA=True, USE_MIXUP=True,
                    MIXUP_PROB=0.5, USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1),
    "vit-3c": dict(),
}


def probe(name: str, n_steps=4, warmup=2):
    cfg_file = f"vsn_tpu/configs/{name}-no_seed-baseline.yaml"
    cfg = load_config(
        override_path=cfg_file,
        extra_overrides=dict(SEED=0, **HARNESS_OVERRIDES.get(name, {})),
    )
    micro = int(cfg.BATCH_SIZE)
    accum = cfg.gradient_accumulation_steps(1)
    vols = micro * accum
    print(f"[{name}] micro={micro} accum={accum} input={cfg.input_size} "
          f"cache={tuple(cfg.IMG_SIZE)}", flush=True)

    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    state = init_train_state(cfg, variables)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    k = cfg.num_classes
    shape = (accum, micro, *cfg.IMG_SIZE, 1)
    batch = {
        "image": rng.standard_normal(shape).astype(np.float16),
        "label": np.eye(k, dtype=np.float32)[rng.integers(0, k, (accum, micro))],
    }
    if cfg.get("USE_MIXUP", False) or cfg.get("USE_CUTMIX", False):
        batch.update({
            "image2": rng.standard_normal(shape).astype(np.float16),
            "label2": np.eye(k, dtype=np.float32)[
                rng.integers(0, k, (accum, micro))
            ],
            "mix_lam": rng.beta(0.3, 0.3, (accum, micro)).astype(np.float32),
            "mix_apply": rng.random((accum, micro)) < 0.5,
            "mix_bounds": np.zeros((accum, micro, 6), np.int32),
        })
    print(f"[{name}] shipping batch "
          f"({sum(v.nbytes for v in batch.values()) / 1e6:.0f} MB)...",
          flush=True)
    batch = jax.device_put(batch)
    base = jax.random.key(0)

    t0 = time.perf_counter()
    for i in range(warmup):
        state, m = step(state, batch, base)
        _ = float(jnp.asarray(m["loss"]))
        print(f"[{name}] warmup {i}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch, base)
    _ = float(jnp.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / n_steps
    print(f"[{name}] step {dt * 1e3:.0f} ms -> {vols / dt:.1f} vol/s/chip",
          flush=True)


if __name__ == "__main__":
    for nm in sys.argv[1:] or ["resnet-5c", "medvit-5c"]:
        probe(nm)
