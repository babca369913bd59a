"""MFU accounting: analytic FLOPs per volume vs measured vol/s (VERDICT #4).

Counts FLOPs by lowering the REAL jitted programs (CPU platform, abstract
batch operands — nothing is executed) and reading XLA's HLO cost analysis:

  * ``fwd``  — one deterministic model forward, per volume (model FLOPs).
  * ``step`` — the full production train step (grad-accum scan, SAM's two
    passes where enabled, MixUp, EMA, optimizer, on-device transform),
    per volume (EXECUTED FLOPs: includes remat recompute).

On CPU the models lower their plain-XLA forms (the Pallas kernels are
TPU-gated), which is exactly right for an analytic count — same math,
countable HLO.

Two utilization numbers, against the v5e peak of 197 bf16 TFLOP/s:

  * ``util_exec`` = step_GFLOP/vol x vol/s / peak — the fraction of the
    MXU's peak the chip actually sustains, counting everything it runs.
  * ``mfu_model`` = 3 x fwd_GFLOP/vol x vol/s / peak — the conventional
    MFU (fwd + 2x fwd for bwd, no remat/SAM credit). For SAM configs the
    executed work is ~2x the model work by design, so mfu_model
    understates how busy the chip is; util_exec is the kernel-target
    selection metric.

Run on CPU (counts only — pair with measured vol/s from BASELINE.md):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/mfu_accounting.py
"""

import os
import sys

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

V5E_PEAK_TFLOPS = 197.0  # bf16

# (config yaml, extra overrides, measured vol/s/chip, note)
# Measured numbers: BASELINE.md rounds 3-4. Overrides mirror the exact
# harness each number was measured under (perf_probe_arch / bench.py).
CASES = [
    ("swin-5c", dict(USE_SAM=True, USE_EMA=True, USE_MIXUP=True,
                     MIXUP_PROB=0.5, USE_SHAKEDROP=True,
                     LABEL_SMOOTHING=0.1, BATCH_SIZE=32,
                     EFFECTIVE_BATCH_SIZE=128),
     54.275, "bench.py north star (SAM 2x)"),
    ("vit-5c", dict(BATCH_SIZE=24, EFFECTIVE_BATCH_SIZE=96),
     359.7, "pre-transform store, minimal aug"),
    ("resnet-5c", dict(USE_BALANCED_SAMPLER=True, USE_SAM=False,
                       USE_EMA=False),
     36.1, "im2col stem + XLA dW"),
    ("medvit-5c", dict(USE_MIXUP=True, MIXUP_PROB=0.5, LABEL_SMOOTHING=0.1,
                       USE_BALANCED_SAMPLER=True),
     29.2, "grouped depthwise, dense stem0"),
]


def flops_of(lowered) -> float:
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def count_case(name, overrides, vols_per_sec, note):
    cfg = load_config(
        override_path=f"vsn_tpu/configs/{name}-no_seed-baseline.yaml",
        extra_overrides=dict(SEED=0, **overrides),
    )
    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)

    fwd_lo = jax.jit(lambda v, x: model.apply(v, x, True)).lower(
        variables,
        jax.ShapeDtypeStruct((1, *cfg.input_size, 1), jnp.bfloat16),
    )
    fwd_gflop = flops_of(fwd_lo) / 1e9

    # Count with accum=1: XLA's HLO cost analysis counts a while/scan BODY
    # once regardless of trip count, so lowering the real accum-N scan
    # undercounts by ~N. Per-volume executed FLOPs are accum-independent
    # (the optimizer's ~0.3 GFLOP/step amortization shift is noise).
    micro = int(cfg.BATCH_SIZE)
    cfg = cfg.replace(EFFECTIVE_BATCH_SIZE=micro)
    accum = cfg.gradient_accumulation_steps(1)
    assert accum == 1
    vols_per_step = micro
    state = init_train_state(cfg, variables)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )
    k = cfg.num_classes
    img = jax.ShapeDtypeStruct((accum, micro, *cfg.IMG_SIZE, 1), jnp.float16)
    lab = jax.ShapeDtypeStruct((accum, micro, k), jnp.float32)
    batch = {"image": img, "label": lab}
    if cfg.get("USE_MIXUP", False) or cfg.get("USE_CUTMIX", False):
        batch.update({
            "image2": img,
            "label2": lab,
            "mix_lam": jax.ShapeDtypeStruct((accum, micro), jnp.float32),
            "mix_apply": jax.ShapeDtypeStruct((accum, micro), jnp.bool_),
            "mix_bounds": jax.ShapeDtypeStruct((accum, micro, 6), jnp.int32),
        })
    step_lo = step.lower(state, batch, jax.random.key(0))
    step_gflop = flops_of(step_lo) / 1e9 / vols_per_step

    achieved = step_gflop * vols_per_sec / 1e3          # TFLOP/s executed
    util_exec = 100.0 * achieved / V5E_PEAK_TFLOPS
    mfu_model = (100.0 * 3.0 * fwd_gflop * vols_per_sec
                 / 1e3 / V5E_PEAK_TFLOPS)
    return dict(name=name, note=note, fwd_gflop=fwd_gflop,
                step_gflop=step_gflop, vols=vols_per_sec,
                achieved_tflops=achieved, util_exec=util_exec,
                mfu_model=mfu_model)


def main():
    rows = []
    for case in CASES:
        print(f"counting {case[0]}...", file=sys.stderr, flush=True)
        rows.append(count_case(*case))
    print("| config | fwd GFLOP/vol | step GFLOP/vol | measured vol/s | "
          "executed TFLOP/s | util (exec) | MFU (model) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} ({r['note']}) | {r['fwd_gflop']:.1f} | "
              f"{r['step_gflop']:.1f} | {r['vols']:.1f} | "
              f"{r['achieved_tflops']:.1f} | {r['util_exec']:.1f}% | "
              f"{r['mfu_model']:.1f}% |")


if __name__ == "__main__":
    main()
