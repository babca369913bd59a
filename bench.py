"""Benchmark: Swin-3D 5-class training throughput with the full stabilization
stack (SAM + EMA + MixUp + ShakeDrop) — the north-star configuration
(BASELINE.md: "MRI volumes/sec/chip (Swin-3D train, SAM+EMA on)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is null: the reference publishes no throughput numbers
(BASELINE.md — paper under review, no benchmarks/ directory) and its CUDA
stack cannot run on this host. The driver's recorded BENCH_r{N}.json series
is the longitudinal baseline instead.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from vsn_tpu.config import load_config
from vsn_tpu.models import build_model
from vsn_tpu.parallel import mesh as meshlib
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    init_train_state,
    make_batch_transform,
    make_train_step,
)


def _tpu_probe_ok(timeout_s: float) -> bool:
    """Check backend liveness in a THROWAWAY subprocess: a dead axon tunnel
    makes jax.devices() hang or raise, and a failed in-process init can get
    cached — so never touch the backend in this process until a probe
    succeeds."""
    code = "import jax; d = jax.devices(); assert d and d[0].platform != 'cpu'"
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s, capture_output=True,
            ).returncode == 0
        )
    except (subprocess.TimeoutExpired, OSError):
        return False


def wait_for_tpu(budget_s: float, probe=_tpu_probe_ok,
                 interval_s: float = 30.0) -> bool:
    """Poll the TPU backend until it answers or the budget runs out.

    The axon tunnel provably flaps for hours (BENCH_r02 was one raw
    JaxRuntimeError); a bounded retry window means the driver's single
    sample per round tolerates a short outage instead of recording a
    traceback."""
    deadline = time.monotonic() + budget_s
    while True:
        remaining = deadline - time.monotonic()
        if remaining < 10.0:
            # under 10 s a probe can't even import jax; honor the budget
            # instead of granting the clamp minimum past the deadline
            return False
        if probe(min(150.0, remaining)):
            return True
        print(f"[bench] TPU backend not up, retrying "
              f"({deadline - time.monotonic():.0f}s left)", file=sys.stderr)
        time.sleep(min(interval_s, max(0.0, deadline - time.monotonic())))


def _emit_unavailable(detail: str) -> None:
    print(json.dumps({
        "metric": "swin3d_5c_train_volumes_per_sec_per_chip_sam_ema",
        "value": None,
        "unit": "volumes/sec/chip",
        "vs_baseline": None,
        "error": "tpu_unavailable",
        "detail": detail[-400:],
    }))


def main():
    from vsn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    # CPU dev mode (JAX_PLATFORMS=cpu) skips the liveness gate; the default
    # axon environment must prove the tunnel answers before this process
    # touches the backend.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        budget = float(os.environ.get("VSN_BENCH_TPU_WAIT_S", "600"))
        if not wait_for_tpu(budget):
            _emit_unavailable(f"no TPU backend within {budget:.0f}s")
            return
    try:
        on_tpu = jax.devices()[0].platform != "cpu"
    except Exception as exc:  # probe passed but in-process init lost a race
        _emit_unavailable(f"backend init failed: {exc!r}")
        return
    # A degraded axon worker can raise ResourceExhausted/Internal mid-step
    # (observed 2026-08-19 15:53; the identical rerun at 16:03 passed), so
    # give the measurement ONE bounded retry. `_measure` rebuilds all state
    # from scratch — the donated buffers of a failed attempt are dead.
    attempts = 1 + int(os.environ.get("VSN_BENCH_RETRIES", "1"))
    for attempt in range(attempts):
        try:
            per_chip = _measure(on_tpu)
            break
        except jax.errors.JaxRuntimeError as exc:
            print(f"[bench] attempt {attempt + 1}/{attempts} failed: "
                  f"{exc!r}"[:800], file=sys.stderr)
            if attempt + 1 == attempts:
                _emit_unavailable(f"runtime error after {attempts} "
                                  f"attempts: {exc!r}")
                return
            time.sleep(60.0)
    print(json.dumps({
        "metric": "swin3d_5c_train_volumes_per_sec_per_chip_sam_ema",
        "value": round(per_chip, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": None,
    }))


def _measure(on_tpu: bool) -> float:
    # North-star config: Swin-T 5c, full stabilization stack. On CPU (dev
    # boxes) shrink shapes so the bench still runs.
    if on_tpu:
        # micro 32 / accum 4 is the measured optimum (scripts/
        # perf_probe_step.py sweep: micro 8 36.8, 16 38.2, 32 39.8,
        # 64 39.3 vol/s) — viable since the fused-kernel VJPs recompute
        # activations instead of stashing them.
        overrides = dict(
            USE_SAM=True, USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
            USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, SEED=0,
            BATCH_SIZE=int(os.environ.get("VSN_BENCH_MICRO", 32)),
            EFFECTIVE_BATCH_SIZE=128,
        )
        n_steps = int(os.environ.get("VSN_BENCH_STEPS", 8))
        warmup = int(os.environ.get("VSN_BENCH_WARMUP", 2))
    else:
        overrides = dict(
            USE_SAM=True, USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
            USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, SEED=0,
            IMG_SIZE=[32, 32, 32], BATCH_SIZE=1,
            EFFECTIVE_BATCH_SIZE=max(4, 2 * jax.device_count()),
            EMBED_DIM=32, DEPTH=[1, 1], HEADS=[2, 4], WINDOW_SIZE=[4, 4, 4],
        )
        n_steps, warmup = 3, 1
    cfg = load_config(extra_overrides=overrides)

    mesh = meshlib.make_mesh()
    world = mesh.size
    grad_accum = cfg.gradient_accumulation_steps(world)
    micro = cfg.BATCH_SIZE * world
    volumes_per_step = grad_accum * micro

    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    params = model.init(jax.random.key(0), x0, True)
    state = init_train_state(cfg, params)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    k = cfg.num_classes
    shape = (grad_accum, micro, *cfg.input_size, 1)
    batch = {
        "image": rng.standard_normal(shape).astype(np.float16),
        "image2": rng.standard_normal(shape).astype(np.float16),
        "label": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (grad_accum, micro))
        ],
        "label2": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (grad_accum, micro))
        ],
        "mix_lam": rng.beta(0.3, 0.3, (grad_accum, micro)).astype(np.float32),
        "mix_apply": rng.random((grad_accum, micro)) < 0.5,
        "mix_bounds": np.zeros((grad_accum, micro, 6), np.int32),
    }
    batch = meshlib.shard_train_batch(batch, mesh)
    base_rng = jax.random.key(0)

    if os.environ.get("VSN_BENCH_VERBOSE"):
        print(f"[bench] compiling... (world={world}, accum={grad_accum}, "
              f"micro={micro})", file=sys.stderr)
    # Force a device->host scalar fetch to sync: jax.block_until_ready does
    # not reliably sync through the axon tunnel (CLAUDE.md).
    t_c = time.perf_counter()
    for i in range(warmup):
        state, m = step(state, batch, base_rng)
        _ = float(jax.numpy.asarray(m["loss"]))
        if os.environ.get("VSN_BENCH_VERBOSE"):
            print(f"[bench] warmup {i}: {time.perf_counter() - t_c:.1f}s",
                  file=sys.stderr)
            t_c = time.perf_counter()

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch, base_rng)
    _ = float(jax.numpy.asarray(m["loss"]))
    dt = time.perf_counter() - t0

    vols_per_sec = volumes_per_step * n_steps / dt
    return vols_per_sec / world


if __name__ == "__main__":
    main()
