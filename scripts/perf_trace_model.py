"""Capture a jax.profiler trace of the full Swin-T fwd+bwd and print the
top device ops (true in-jit decomposition — per-dispatch tunnel latency
contaminated all single-call microbenchmarks).

Usage: timeout 590 python scripts/perf_trace_model.py [ARCH]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = "/tmp/vsn_trace"


def _trace_and_report():
    """Parse the captured xplane with the direct XSpace reader (the
    tensorboard_plugin_profile converter is protobuf-incompatible in this
    image — see scripts/trace_top_ops.py)."""
    xplanes = glob.glob(f"{OUT}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    import subprocess

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "trace_top_ops.py"), xplanes[0], "30"],
        check=False,
    )


def _trace_full_step():
    """Trace the REAL bench train step (full 5c stack: SAM double pass,
    grad-accum scan, MixUp, EMA, optimizer) — the model-only trace hides
    what the step's schedule absorbs (the zconv patch-embed lesson:
    an isolated 8 ms win was a step-level wash)."""
    import shutil
    import time

    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model
    from vsn_tpu.parallel import mesh as meshlib
    from vsn_tpu.train.schedules import lr_wd_schedules
    from vsn_tpu.train.step import (
        init_train_state,
        make_batch_transform,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    overrides = dict(
        USE_SAM=True, USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, SEED=0,
        BATCH_SIZE=int(os.environ.get("VSN_BENCH_MICRO", 32)),
        EFFECTIVE_BATCH_SIZE=128,
    )
    cfg = load_config(extra_overrides=overrides)
    mesh = meshlib.make_mesh()
    grad_accum = cfg.gradient_accumulation_steps(mesh.size)
    micro = cfg.BATCH_SIZE * mesh.size
    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    params = model.init(jax.random.key(0), x0, True)
    state = init_train_state(cfg, params)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)),
        donate_argnums=(0,),
    )
    k = cfg.num_classes
    shape = (grad_accum, micro, *cfg.input_size, 1)
    batch = {
        "image": rng.standard_normal(shape).astype(np.float16),
        "image2": rng.standard_normal(shape).astype(np.float16),
        "label": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (grad_accum, micro))],
        "label2": np.eye(k, dtype=np.float32)[
            rng.integers(0, k, (grad_accum, micro))],
        "mix_lam": rng.beta(0.3, 0.3, (grad_accum, micro)).astype(np.float32),
        "mix_apply": rng.random((grad_accum, micro)) < 0.5,
        "mix_bounds": np.zeros((grad_accum, micro, 6), np.int32),
    }
    batch = meshlib.shard_train_batch(batch, mesh)
    base_rng = jax.random.key(0)
    for i in range(2):
        t0 = time.perf_counter()
        state, m = step(state, batch, base_rng)
        loss = float(jnp.asarray(m["loss"]))
        print(f"warmup {i}: loss {loss:.4f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    shutil.rmtree(OUT, ignore_errors=True)
    with jax.profiler.trace(OUT):
        state, m = step(state, batch, base_rng)
        float(jnp.asarray(m["loss"]))
    print("step trace captured", flush=True)
    _trace_and_report()


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "Swin"
    if arch == "Step":
        _trace_full_step()
        return
    rng = np.random.default_rng(0)
    if arch == "Swin":
        from vsn_tpu.models.swin3d import SwinTransformer3D

        model = SwinTransformer3D(
            patch_size=(4, 4, 4), num_classes=5, embed_dim=96,
            depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
            window_size=(6, 7, 6), use_pallas=True, dtype=jnp.bfloat16,
        )
        x = jnp.asarray(rng.standard_normal((8, 144, 168, 144, 1)),
                        jnp.bfloat16)
    else:
        from vsn_tpu.models.vit3d import ViT3D

        model = ViT3D(
            img_size=(144, 160, 144), patch_size=(16, 16, 16), num_classes=3,
            embed_dim=384, depth=12, num_heads=6, mlp_dim=1536,
            use_pallas=True, dtype=jnp.bfloat16,
        )
        x = jnp.asarray(rng.standard_normal((24, 144, 160, 144, 1)),
                        jnp.bfloat16)

    variables = model.init(jax.random.key(0), x, True)

    def loss(p, xx):
        return model.apply({"params": p}, xx, True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    params = variables["params"]
    for _ in range(2):
        out = g(params, x)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    with jax.profiler.trace(OUT):
        for _ in range(3):
            out = g(params, x)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    print("trace captured", flush=True)

    _trace_and_report()


if __name__ == "__main__":
    main()
