"""Eval-matrix wall-time probe: plain vs TTA eval, device-resident volumes.

Measures what the best-N eval matrix actually costs per checkpoint x split
on one chip: Evaluator.predict_dataset over an on-device synthetic cohort
(volumes generated in HBM — the axon tunnel at ~4 MB/s would otherwise
swamp the measurement, BASELINE.md). Reference protocol being priced:
/root/reference/eval/eval_transformer.py (best-N x {ID, OD} x TTA 8 views).

Usage: setsid nohup timeout 2400 python scripts/perf_probe_eval.py \
    > /tmp/evalprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.config import load_config
from vsn_tpu.data.resident import ResidentVolumes
from vsn_tpu.eval.evaluate import Evaluator
from vsn_tpu.models import build_model

# 256 full-size f16 volumes ~ 1.8 GB HBM: two full batches even at the
# batch-128 sweep point (48 would leave 80 pad rows in a 128-row batch).
N_VOLS = 256


class _IdxDataset:
    """Minimal dataset shim for EvalPipeline's resident path: labels only
    (load_images=False means ``gather`` is never called)."""

    def __init__(self, n, k):
        rng = np.random.default_rng(0)
        self.labels = np.eye(k, dtype=np.float32)[rng.integers(0, k, n)]

    def __len__(self):
        return len(self.labels)


def main():
    cfg = load_config("vsn_tpu/configs/swin-5c-no_seed-baseline.yaml")
    global N_VOLS
    if "--small" in sys.argv:  # CPU smoke: tiny geometry, few volumes
        cfg = cfg.replace(IMG_SIZE=[24, 28, 24])
        N_VOLS = 8
    model = build_model(cfg)
    d, h, w = cfg.input_size
    key = jax.random.PRNGKey(0)

    store = ResidentVolumes(
        data=jax.random.normal(key, (N_VOLS, d, h, w, 1), jnp.float16),
        scale=None, offset=None,
    )
    jax.block_until_ready(store.data)
    print(f"resident store: {store.nbytes / 1e6:.0f} MB on device", flush=True)

    x0 = jnp.zeros((1, d, h, w, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x0, True)
    ds = _IdxDataset(N_VOLS, cfg.num_classes)

    # Plain-eval batch sweep (VERDICT r3 #5): eval has no activation-grad
    # memory, so larger-than-train batches should be free throughput — the
    # round-3 judge measured 73.9 vol/s at the train micro size vs a ~250
    # vol/s fwd-only bound. Each Evaluator also runs the one-batch-deep
    # dispatch pipeline (fetch i-1 while the device computes i).
    sweeps = ([(False, b) for b in (4, 8, 16, 32)] + [(True, 4)]
              if "--small" in sys.argv else
              [(False, b) for b in (8, 32, 64, 128)] + [(True, 8)])
    # Override, e.g. VSN_EVAL_SWEEP="tta:16,tta:32,plain:64".
    env_sweep = os.environ.get("VSN_EVAL_SWEEP")
    if env_sweep:
        sweeps = [
            (kind.strip() == "tta", int(bs))
            for kind, bs in (s.split(":") for s in env_sweep.split(","))
        ]
    for use_tta, bs in sweeps:
        ev = Evaluator(cfg, model, use_tta=use_tta, batch_size=bs)
        tag = ("tta" if use_tta else "plain") + f"-b{bs}"
        # warmup (compile)
        t0 = time.perf_counter()
        ev.predict_dataset(variables, ds, resident=store)
        print(f"{tag}: first pass (compile) {time.perf_counter() - t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            probs, gt = ev.predict_dataset(variables, ds, resident=store)
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag}: {N_VOLS / dt:8.2f} vol/s  ({dt * 1e3:.0f} ms "
              f"per {N_VOLS}-volume split)", flush=True)

    # Matrix cost: best-N=10 checkpoints x 2 splits at the measured rates.
    print("matrix estimate: 10 ckpts x (ID 2437 + OD 2922) vols at the "
          "rates above", flush=True)


if __name__ == "__main__":
    main()
