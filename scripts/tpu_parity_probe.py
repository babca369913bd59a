"""On-chip fused-vs-unfused parity gate.

All round-2 fused-kernel math changes (softmax thinning, (u,r)-basis
backward, statically-maskless attention, in-band LayerScale/post-norm) were
validated in Pallas INTERPRET mode on CPU; this probe compiles the real
Mosaic kernels on the TPU chip and asserts the fused Swin path (packed
windows + window-resident stream + custom VJPs) matches the plain XLA path
on the production geometries:

1. strict f32 parity on a 48x56x48 volume (stage-1 divisible 12x14x12 with
   the production (6,7,6) window — N=252, head_dim 32 — plus a clamped
   single-window tail stage), forward AND parameter grads;
2. production bf16 parity on the full 144x168x144 Swin-T (packed stage 3),
   forward + grad-norm, with bf16-ordering tolerances.

Exits 0 and prints PASS iff everything matches; any numeric divergence on
chip means the Mosaic compilation of the kernels is wrong and NO benchmark
may be trusted until fixed. Run FIRST in scripts/tpu_queue.sh.

Usage: setsid nohup python scripts/tpu_parity_probe.py > /tmp/parity.log 2>&1 &
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
from vsn_tpu.utils.cache import enable_compile_cache


def _grad_leaves(model, variables, x):
    def loss(p):
        out = model.apply({"params": p}, x, True)
        return (out.astype(jnp.float32) ** 2).sum()

    return jax.grad(loss)(variables["params"])


def _tree_norm(tree):
    return float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree.leaves(tree))
        )
    )


def _compare_trees(gf, gu, rtol, atol, tag):
    flat_u = dict(jax.tree.leaves_with_path(gu))
    worst = (0.0, None)
    for path, leaf in jax.tree.leaves_with_path(gf):
        a = np.asarray(leaf, np.float32)
        b = np.asarray(flat_u[path], np.float32)
        denom = np.maximum(np.abs(b), atol / max(rtol, 1e-30))
        rel = float(np.max(np.abs(a - b) / denom)) if a.size else 0.0
        if rel > worst[0]:
            worst = (rel, path)
        if not np.allclose(a, b, rtol=rtol, atol=atol):
            print(f"FAIL {tag} grad mismatch at {path}: "
                  f"max|d|={np.abs(a - b).max():.3e} rel={rel:.3e}")
            return False
    print(f"  {tag} grads OK (worst rel {worst[0]:.2e} at {worst[1]})")
    return True


def run_case(tag, overrides, x_dtype, rtol, atol, check_grads):
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="Swin",
        DISEASES=["CN", "AD", "PNFA", "BV", "SD"],
        SEED=0,
        **overrides,
    ))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, *cfg.input_size, 1)), x_dtype)

    outs, grads, norms = {}, {}, {}
    for name, flag in (("fused", True), ("unfused", False)):
        model = build_model(cfg.replace(USE_PALLAS_ATTENTION=flag))
        t0 = time.time()
        if name == "fused":
            variables = model.init(jax.random.key(0), x, True)
            run_case.variables = variables
        else:
            variables = run_case.variables  # identical trees (tested)
        out = jax.jit(lambda v, xx: model.apply(v, xx, True))(variables, x)
        outs[name] = np.asarray(out, np.float32)
        print(f"  {tag}/{name} fwd compiled+ran in {time.time() - t0:.1f}s "
              f"logits[0] {outs[name][0][:3]}")
        if check_grads:
            t0 = time.time()
            g = jax.jit(lambda v, xx: _grad_leaves(model, v, xx))(
                variables, x)
            if check_grads == "tree":
                grads[name] = jax.tree.map(np.asarray, g)
            norms[name] = _tree_norm(g)
            print(f"  {tag}/{name} grads in {time.time() - t0:.1f}s "
                  f"norm {norms[name]:.6g}")

    d = np.abs(outs["fused"] - outs["unfused"]).max()
    scale = np.abs(outs["unfused"]).max()
    print(f"  {tag} fwd max|d| {d:.3e} (scale {scale:.3e})")
    ok = bool(np.allclose(outs["fused"], outs["unfused"],
                          rtol=rtol, atol=atol))
    if not ok:
        print(f"FAIL {tag} forward mismatch")
    if check_grads and ok:
        gn_rel = abs(norms["fused"] - norms["unfused"]) / max(
            norms["unfused"], 1e-30)
        print(f"  {tag} grad-norm rel diff {gn_rel:.3e}")
        ok = gn_rel < 10 * rtol
        if check_grads == "tree":
            ok = ok and _compare_trees(
                grads["fused"], grads["unfused"], 10 * rtol, 10 * atol, tag)
    return ok


def main():
    enable_compile_cache()
    if os.environ.get("VSN_PARITY_CPU_SMOKE") == "1":
        # Mechanics smoke test on CPU: force the fused gate open in Pallas
        # interpret mode (the tests' _ForceTpu recipe). Not a chip result.
        import vsn_tpu.ops.window_attention as wa

        wa._on_tpu = lambda: False
        real = jax.devices

        class _FakeDev:
            platform = "tpu"

        jax.devices = (
            lambda *a, **k: [_FakeDev()] if not a and not k else real(*a, **k)
        )
    assert jax.devices()[0].platform == "tpu", (
        "parity probe must run on the real chip (Mosaic compilation is the "
        "thing under test)")

    ok = True
    # 1. strict f32: divisible stage-1 geometry w/ production window (N=252,
    #    head_dim 32) + clamped tail stage; fwd + full grads tree.
    ok &= run_case(
        "f32-small",
        dict(IMG_SIZE=[48, 56, 48], DEPTH=[3, 2], HEADS=[3, 6],
             STOCHASTIC_DEPTH_PROB=0.0, FP16=False),
        jnp.float32, rtol=1e-4, atol=1e-4, check_grads="tree",
    )
    # 2. production bf16 full Swin-T incl. the packed stage 3; fwd +
    #    grad-norm only (full-tree transfer of 28M grads x2 over the
    #    ~4 MB/s tunnel would dominate).
    ok &= run_case(
        "bf16-full",
        dict(STOCHASTIC_DEPTH_PROB=0.0),
        jnp.bfloat16, rtol=5e-2, atol=5e-2, check_grads="norm",
    )
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
