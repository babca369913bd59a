"""MedViT-S / ResNet-18 component time split on the real chip (fwd+bwd,
micro 8, bf16, device-resident inputs) — VERDICT r1 item 4: measure where
their step time goes before optimizing (conv-bound is an acceptable answer
if measured).

MedViT stages run at /4 /8 /16 /32 of the 144x168x144 input with the
reference's [3,4,10,3] ECB/LTB schedule; ResNet-18 layers at the same
strides. Results recorded in BASELINE.md.

Usage: setsid nohup python scripts/perf_probe_medvit_resnet.py \
    > /tmp/mrprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

MICRO = 8
DT = jnp.bfloat16


def timeit(name, fn, n=6, warmup=2):
    for _ in range(warmup):
        out = fn()
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:16s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def grad_time(name, module, x, n=6):
    variables = module.init(jax.random.key(0), x, True)
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, xx):
        # deterministic=False: TRAIN-mode BN, matching the train step
        # whose cost these components decompose.
        out = module.apply(
            {"params": p, **consts}, xx, False,
            mutable=[k for k in consts],
        )[0]
        return out.astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    timeit(name, lambda: g(params, x), n=n)


class MedViTStem(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.medvit3d import ConvBNReLU
        for i, (ch, s) in enumerate(zip([64, 32, 64, 64], [2, 1, 1, 2])):
            x = ConvBNReLU(ch, 3, s, dtype=DT, name=f"stem{i}")(
                x, deterministic)
        return x


class MedViTStage(nn.Module):
    chans: tuple
    kinds: tuple
    stride: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.medvit3d import ECB, LTB
        common = dict(head_dim=32, mlp_ratio=3.0, residual_kw=dict(),
                      dtype=DT, drop_path_rate=0.0)
        for i, (ch, kind) in enumerate(zip(self.chans, self.kinds)):
            stride = self.stride if i == 0 else 1
            if kind == "ECB":
                x = ECB(out_channels=ch, stride=stride, **common,
                        name=f"b{i}")(x, deterministic)
            else:
                x = LTB(out_channels=ch, stride=stride,
                        sr_ratio=self.sr_ratio, mix_block_ratio=0.75,
                        attention_dropout=0.0, dropout=0.0, **common,
                        name=f"b{i}")(x, deterministic)
        return x


class ResNetLayer(nn.Module):
    planes: int
    blocks: int
    stride: int
    project_first: bool

    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.resnet3d import BasicBlock3D
        for i in range(self.blocks):
            x = BasicBlock3D(
                planes=self.planes, stride=self.stride if i == 0 else 1,
                shortcut_type="B",
                needs_projection=self.project_first and i == 0,
                dtype=DT, name=f"b{i}",
            )(x, deterministic)
        return x


class ResNetStem(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        from vsn_tpu.models.resnet3d import _bn
        x = nn.Conv(64, (7, 7, 7), strides=(1, 2, 2), padding=3,
                    use_bias=False, dtype=DT, name="conv1")(x)
        x = _bn(DT, "bn1")(x, use_running_average=deterministic)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 1)] * 3)


def main():
    rng = np.random.default_rng(0)
    which = sys.argv[1:] or ["medvit", "resnet"]

    if "medvit" in which:
        print("== MedViT-S components (micro 8, fwd+bwd) ==", flush=True)
        x_in = jnp.asarray(
            rng.standard_normal((MICRO, 144, 168, 144, 1)), DT)
        grad_time("mv_stem", MedViTStem(), x_in)
        stages = [
            # (in_res, in_ch, chans, kinds, stride, sr)
            ((36, 42, 36), 64, (96,) * 3, ("ECB",) * 3, 1, 8),
            ((36, 42, 36), 96, (192, 192, 192, 256),
             ("ECB", "ECB", "ECB", "LTB"), 2, 4),
            ((18, 21, 18), 256, (384, 384, 384, 384, 512) * 2,
             ("ECB", "ECB", "ECB", "ECB", "LTB") * 2, 2, 2),
            ((9, 11, 9), 512, (768,) * 3, ("ECB", "ECB", "LTB"), 2, 1),
        ]
        for i, (res, cin, chans, kinds, stride, sr) in enumerate(stages):
            x = jnp.asarray(rng.standard_normal((MICRO, *res, cin)), DT)
            grad_time(
                f"mv_stage{i}",
                MedViTStage(chans=chans, kinds=kinds, stride=stride,
                            sr_ratio=sr), x,
            )

    if "resnet" in which:
        print("== ResNet-18 components (micro 8, fwd+bwd) ==", flush=True)
        x_in = jnp.asarray(
            rng.standard_normal((MICRO, 144, 168, 144, 1)), DT)
        grad_time("rn_stem", ResNetStem(), x_in)
        # stem: conv1 stride (1,2,2) then maxpool /2 -> (72, 42, 36) @ 64
        layers = [
            ((72, 42, 36), 64, 64, 2, 1, False),
            ((72, 42, 36), 64, 128, 2, 2, True),
            ((36, 21, 18), 128, 256, 2, 2, True),
            ((18, 11, 9), 256, 512, 2, 2, True),
        ]
        for i, (res, cin, planes, blocks, stride, proj) in enumerate(layers):
            x = jnp.asarray(rng.standard_normal((MICRO, *res, cin)), DT)
            grad_time(
                f"rn_layer{i + 1}",
                ResNetLayer(planes=planes, blocks=blocks, stride=stride,
                            project_first=proj), x,
            )


if __name__ == "__main__":
    main()
