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


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "Swin"
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

    # parse: find the xplane file and print top ops by self time
    xplanes = glob.glob(f"{OUT}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
    import csv
    import io

    rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    hdr = rows[0]
    print("columns:", hdr, flush=True)
    try:
        name_i = hdr.index("Operation")
    except ValueError:
        name_i = 1
    for r in rows[1:25]:
        print(r, flush=True)


if __name__ == "__main__":
    main()
