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
   forward + per-module grad norms, with bf16-ordering tolerances.

The probe also asserts the fused lowering actually contains Mosaic custom
calls (and the unfused one doesn't) — a silently-closed fused_block_gate
would otherwise make the whole comparison vacuous XLA-vs-XLA.

Prints a final PASS (exit 0) or FAIL (exit 1) line iff the comparison RAN;
infra failures (timeout, tunnel crash) leave neither marker, which
scripts/tpu_queue.sh uses to distinguish "kernels are wrong — stop" from
"probe couldn't run — continue with a warning".

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


@jax.jit
def _module_norms(tree):
    """Per-top-level-module grad norms, computed on device in ONE dispatch
    (a leaf-wise eager loop costs hundreds of remote round trips through the
    axon tunnel)."""
    return {
        k: jnp.sqrt(
            sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree.leaves(sub))
        )
        for k, sub in tree.items()
    }


def _compare_trees(gf, gu, rtol, atol, tag):
    flat_u = dict(jax.tree.leaves_with_path(gu))
    worst = (0.0, None)
    for path, leaf in jax.tree.leaves_with_path(gf):
        a = np.asarray(leaf, np.float32)
        b = np.asarray(flat_u[path], np.float32)
        if not (np.isfinite(a).all() and np.isfinite(b).all()):
            print(f"FAIL {tag} non-finite grads at {path}")
            return False
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


def _assert_fused_engaged(tag, models, variables, x):
    """The fused lowering must contain Mosaic custom calls and the unfused
    one must not — otherwise the parity comparison is XLA-vs-XLA and proves
    nothing about the kernels under test. lower() only traces (client-side),
    it does not pay the remote compile."""
    if os.environ.get("VSN_PARITY_CPU_SMOKE") == "1":
        return True  # interpret-mode lowering carries no Mosaic custom call
    markers = ("tpu_custom_call", "mosaic")

    def has_kernels(model):
        txt = jax.jit(
            lambda v, xx: model.apply(v, xx, True)).lower(variables, x
        ).as_text().lower()
        return any(m in txt for m in markers)

    fused_ok = has_kernels(models["fused"])
    unfused_clean = not has_kernels(models["unfused"])
    if not fused_ok:
        print(f"FAIL {tag}: fused model lowering contains no Mosaic custom "
              f"call — fused_block_gate fell back, comparison is vacuous")
    if not unfused_clean:
        print(f"FAIL {tag}: unfused model lowering unexpectedly contains "
              f"Mosaic custom calls")
    return fused_ok and unfused_clean


def run_case(tag, overrides, x_dtype, rtol, atol, check_grads,
             norm_rtol=None):
    """norm_rtol bounds the per-module grad-NORM relative difference
    (defaults to 2*rtol). It is looser than the forward tolerance because
    on the real chip f32 matmuls run the MXU's bf16-pass algorithms and the
    fused kernels' reduction order (revisited-output accumulation) differs
    from XLA's — measured 2026-08-19: a UNIFORM rel 2.8e-4..8.4e-4 across
    all 6 modules (fwd at atol level, bf16-full green). The math itself is
    pinned exact (~1e-6) by the CPU interpret-mode parity tests, which run
    the same kernel bodies; this on-chip gate exists to catch Mosaic
    CODEGEN errors, which present as gross or structured mismatches, not a
    uniform sub-1e-3 shift."""
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="Swin",
        DISEASES=["CN", "AD", "PNFA", "BV", "SD"],
        SEED=0,
        **overrides,
    ))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, *cfg.input_size, 1)), x_dtype)

    models = {
        "fused": build_model(cfg.replace(USE_PALLAS_ATTENTION=True)),
        "unfused": build_model(cfg.replace(USE_PALLAS_ATTENTION=False)),
    }
    variables = models["fused"].init(jax.random.key(0), x, True)
    if not _assert_fused_engaged(tag, models, variables, x):
        return False

    outs, grads, norms = {}, {}, {}
    for name, model in models.items():
        t0 = time.time()
        # identical param trees fused vs unfused (tested) — share one init
        out = jax.jit(lambda v, xx: model.apply(v, xx, True))(variables, x)
        outs[name] = np.asarray(out, np.float32)
        print(f"  {tag}/{name} fwd compiled+ran in {time.time() - t0:.1f}s "
              f"logits[0] {outs[name][0][:3]}")
        if check_grads:
            t0 = time.time()
            g = jax.jit(lambda v, xx: _grad_leaves(models[name], v, xx))(
                variables, x)
            if check_grads == "tree":
                grads[name] = jax.tree.map(np.asarray, g)
            norms[name] = {
                k: float(v) for k, v in
                jax.device_get(_module_norms(g)).items()
            }
            total = float(np.sqrt(sum(v * v for v in norms[name].values())))
            print(f"  {tag}/{name} grads in {time.time() - t0:.1f}s "
                  f"norm {total:.6g}")

    d = np.abs(outs["fused"] - outs["unfused"]).max()
    scale = np.abs(outs["unfused"]).max()
    print(f"  {tag} fwd max|d| {d:.3e} (scale {scale:.3e})")
    ok = bool(
        np.isfinite(outs["fused"]).all()
        and np.allclose(outs["fused"], outs["unfused"], rtol=rtol, atol=atol)
    )
    if not ok:
        print(f"FAIL {tag} forward mismatch")
    if check_grads and ok:
        nr = 2 * rtol if norm_rtol is None else norm_rtol
        # per-MODULE norms (not one global norm, where a zeroed submodule
        # hides inside a <1% shift of the total)
        for k, nf in norms["fused"].items():
            nu = norms["unfused"][k]
            rel = abs(nf - nu) / max(abs(nu), 1e-30)
            if not (np.isfinite(nf) and np.isfinite(nu) and rel < nr):
                print(f"FAIL {tag} grad-norm mismatch for module {k}: "
                      f"fused {nf:.6g} unfused {nu:.6g} rel {rel:.3e}")
                ok = False
        if ok:
            print(f"  {tag} per-module grad norms OK "
                  f"({len(norms['fused'])} modules, rtol {nr:g})")
        if check_grads == "tree":
            # per-leaf rel noise from differing MXU bf16-pass rounding can
            # exceed the norm-level shift; bound by the same calibrated gate
            ok = ok and _compare_trees(
                grads["fused"], grads["unfused"],
                max(10 * rtol, nr), 10 * atol, tag)
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
        # calibrated on-chip 2026-08-19: uniform 2.8e-4..8.4e-4 from MXU
        # bf16-pass rounding-order differences (see run_case docstring);
        # 5e-3 still catches any structured codegen error
        norm_rtol=5e-3,
    )
    # 2. production bf16 full Swin-T incl. the packed stage 3; fwd +
    #    per-module grad norms (full-tree transfer of 28M grads x2 over the
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
