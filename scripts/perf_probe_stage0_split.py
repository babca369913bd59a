"""MedViT stage0 INTERNAL op split on the real chip — the data behind the
VERDICT r4 #5 closure (stage0 = ~42% of MedViT's component time at both
the round-2 and round-5 measurements; 113.7 ms fwd+bwd at micro 8).

One stage-0 ECB (reference medvit_3d.py:66-217) decomposed into its ops
at the stage-0 geometry (micro 8, 36x42x36, C=96, mlp_ratio 3 -> hidden
288): each op timed as an isolated jitted fwd+bwd (same protocol as
perf_probe_medvit_resnet.py), plus the whole ECB for the fusion residual.
Sub-op times DOUBLE-COUNT boundary HBM traffic (each isolated op re-reads
its input from HBM where the fused stage may keep it in cache), so
sum(parts) >= whole is expected; the split still ranks WHERE the time
goes.

Also prints the analytic bf16 HBM floor per op (bytes moved at 819 GB/s
on v5e: fwd read+write, bwd ~2x) so each measurement lands next to its
speed-of-light.

Usage: setsid nohup timeout 3600 python scripts/perf_probe_stage0_split.py \
    > /tmp/q11_stage0_split.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

MICRO = int(os.environ.get("VSN_S0_MICRO", 8))
RES = tuple(int(v) for v in
            os.environ.get("VSN_S0_RES", "36,42,36").split(","))
C = 96
DT = jnp.bfloat16
BW = 819e9  # v5e HBM bytes/s


def grad_time(name, module, x, floor_bytes, n=6, warmup=2):
    variables = module.init(jax.random.key(0), x, True)
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, xx):
        # deterministic=False: TRAIN-mode BN (batch moments + their
        # backward correlation terms), matching the step being decomposed.
        out = module.apply({"params": p, **consts}, xx, False,
                           mutable=list(consts))[0]
        return out.astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    for _ in range(warmup):
        out = g(params, x)
        _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(params, x)
    _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n
    floor_ms = floor_bytes / BW * 1e3
    print(f"{name:12s} {dt * 1e3:8.2f} ms   (bf16 HBM floor ~{floor_ms:5.2f} ms"
          f" = {floor_bytes / 1e6:6.0f} MB)", flush=True)
    return dt


class _Wrap(nn.Module):
    """Isolate one sub-op of the ECB with train-mode BN where it has one."""

    kind: str

    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.medvit3d import (
            MHCA, PatchEmbedAvg, SELayer, _bn, h_swish, trunc_normal_init)
        from vsn_tpu.ops.conv_unfold import DepthwiseConv

        k = self.kind
        if k == "embed":  # 64 -> 96 1x1 + BN (first ECB of the stage)
            return PatchEmbedAvg(C, 1, dtype=DT, name="pe")(x, deterministic)
        if k == "mhca_gc":  # grouped 3^3 conv + BN + relu (head_dim 32)
            y = nn.Conv(C, (3, 3, 3), padding=1, feature_group_count=C // 32,
                        use_bias=False, dtype=DT, name="gc")(x)
            y = _bn(DT, "bn")(y, use_running_average=deterministic)
            return nn.relu(y)
        if k == "mhca_proj":  # 1x1 96 -> 96
            return nn.Conv(C, (1, 1, 1), use_bias=False, dtype=DT,
                           name="proj")(x)
        if k == "mhca":  # full branch incl. pre-BN
            y = _bn(DT, "norm1")(x, use_running_average=deterministic)
            return MHCA(32, dtype=DT, name="mhca")(y, deterministic)
        if k == "expand":  # 1x1 96 -> 288 + BN + h_swish
            y = nn.Conv(3 * C, (1, 1, 1), use_bias=False, dtype=DT,
                        name="ex")(x)
            y = _bn(DT, "bn")(y, use_running_average=deterministic)
            return h_swish(y)
        if k == "dw288":  # depthwise 3^3 at hidden width + BN + h_swish
            y = DepthwiseConv((3, 3, 3), dtype=DT, name="dw")(x)
            y = _bn(DT, "bn")(y, use_running_average=deterministic)
            return h_swish(y)
        if k == "se288":  # SE at hidden width
            return SELayer(reduction=C, dtype=DT, name="se")(x)
        if k == "project":  # 1x1 288 -> 96 + BN
            y = nn.Conv(C, (1, 1, 1), use_bias=False, dtype=DT,
                        name="pr")(x)
            return _bn(DT, "bn")(y, use_running_average=deterministic)
        raise ValueError(k)


class _ECB(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.medvit3d import ECB

        return ECB(out_channels=C, stride=1, head_dim=32, mlp_ratio=3.0,
                   residual_kw=dict(), dtype=DT, drop_path_rate=0.0,
                   name="ecb")(x, deterministic)


def main():
    rng = np.random.default_rng(0)
    nvox = MICRO * int(np.prod(RES))
    mb96 = nvox * C * 2  # one 96-wide bf16 tensor
    mb288 = 3 * mb96

    x96 = jnp.asarray(rng.standard_normal((MICRO, *RES, C)), DT)
    x288 = jnp.asarray(rng.standard_normal((MICRO, *RES, 3 * C)), DT)
    x64 = jnp.asarray(rng.standard_normal((MICRO, *RES, 64)), DT)

    print(f"== stage-0 ECB op split (micro {MICRO}, {RES}, C={C}) ==",
          flush=True)
    # floors: fwd in+out, bwd dy in + dx out (+ refetch of saved input);
    # conservative 2x fwd for elementwise/conv chains.
    grad_time("embed", _Wrap("embed"), x64, 2 * (nvox * 64 * 2 + mb96))
    grad_time("mhca_gc", _Wrap("mhca_gc"), x96, 2 * (2 * mb96) + mb96)
    grad_time("mhca_proj", _Wrap("mhca_proj"), x96, 2 * (2 * mb96) + mb96)
    grad_time("mhca_full", _Wrap("mhca"), x96, 3 * (2 * mb96) + 2 * mb96)
    grad_time("lff_expand", _Wrap("expand"), x96, 2 * (mb96 + mb288) + mb288)
    grad_time("lff_dw288", _Wrap("dw288"), x288, 2 * (2 * mb288) + mb288)
    grad_time("lff_se288", _Wrap("se288"), x288, 2 * (2 * mb288) + mb288)
    grad_time("lff_project", _Wrap("project"), x288, 2 * (mb288 + mb96) + mb288)
    grad_time("ecb_whole", _ECB(), x96, 0)


if __name__ == "__main__":
    main()
