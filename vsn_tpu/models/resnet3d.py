"""3D ResNet (10/18/34/50/101/152/200) for volumetric MRI.

Capability parity with reference models/resnet_3d.py (3D-ResNets-PyTorch
lineage): 7^3 stem conv with stride (1,2,2), BN+ReLU, 3^3 stride-2 maxpool,
four stages of BasicBlock/Bottleneck, shortcut type A (strided avg-pool +
zero-channel-pad) or B (1x1 conv + BN), adaptive average pool, FC head; the
``ResNet3DMedical`` wrapper adds head dropout and the IMG_SIZE mapping
(resnet_3d.py:115-200, 269-357).

TPU-first:
  * channels-last NDHWC with flax Conv — XLA's native conv layout;
  * BatchNorm running stats live in the ``batch_stats`` collection threaded
    through the train step; cross-device sync (reference SyncBN,
    train_transformer.py:2089-2090) is automatic under a global-view jit;
  * stride ordering follows the reference's (depth, height, width) = (1,2,2)
    stem semantics on [D, H, W] volumes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# layers-per-stage per variant (reference resnet_3d.py:224-266)
RESNET_LAYERS = {
    "resnet10": ("basic", [1, 1, 1, 1]),
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
    "resnet200": ("bottleneck", [3, 24, 36, 3]),
}


def _bn(dtype, name):
    return nn.BatchNorm(
        use_running_average=None,  # bound via deterministic at call sites
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    shortcut_type: str = "B"
    needs_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        s = (self.stride,) * 3
        y = nn.Conv(self.planes, (3, 3, 3), s, padding=1, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(x)
        y = _bn(self.dtype, "bn1")(y, use_running_average=deterministic)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv2")(y)
        y = _bn(self.dtype, "bn2")(y, use_running_average=deterministic)
        if self.needs_projection:
            residual = shortcut(
                x, self.planes, self.stride, self.shortcut_type, self.dtype,
                deterministic,
            )
        return nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    shortcut_type: str = "B"
    needs_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(x)
        y = _bn(self.dtype, "bn1")(y, use_running_average=deterministic)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), (self.stride,) * 3, padding=1,
                    use_bias=False, kernel_init=kaiming_out, dtype=self.dtype,
                    name="conv2")(y)
        y = _bn(self.dtype, "bn2")(y, use_running_average=deterministic)
        y = nn.relu(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv3")(y)
        y = _bn(self.dtype, "bn3")(y, use_running_average=deterministic)
        if self.needs_projection:
            residual = shortcut(
                x, self.planes * self.expansion, self.stride,
                self.shortcut_type, self.dtype, deterministic,
            )
        return nn.relu(y + residual)


def shortcut(x, out_planes, stride, kind, dtype, deterministic):
    """Type A: strided identity (avg-pool k=1) + zero channel padding
    (reference downsample_basic_block:30-40); type B: 1x1 conv + BN."""
    if kind == "A":
        y = x[:, ::stride, ::stride, ::stride, :] if stride > 1 else x
        pad = out_planes - y.shape[-1]
        if pad > 0:
            y = jnp.pad(y, [(0, 0)] * 4 + [(0, pad)])
        return y
    y = nn.Conv(out_planes, (1, 1, 1), (stride,) * 3, use_bias=False,
                kernel_init=kaiming_out, dtype=dtype,
                name="downsample_conv")(x)
    return _bn(dtype, "downsample_bn")(y, use_running_average=deterministic)


class ResNet3D(nn.Module):
    block: str                     # 'basic' | 'bottleneck'
    layers: Sequence[int]
    num_classes: int
    shortcut_type: str = "B"
    in_channels: int = 1
    head_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, D, H, W, C]
        x = x.astype(self.dtype)
        block_cls = BasicBlock3D if self.block == "basic" else Bottleneck3D
        expansion = 1 if self.block == "basic" else 4

        # Pallas im2col stem: the C_in=1 7^3 conv runs at 1/128 MXU
        # utilization under XLA (154.5 ms fwd at micro 8 — BASELINE.md);
        # the halo-im2col kernel (ops/stem_im2col.py) contracts all 343
        # taps on the MXU with the tap matrix living only in VMEM. Same
        # param tree as nn.Conv.
        from vsn_tpu.ops.conv_unfold import UnfoldedConv

        x = UnfoldedConv(64, (7, 7, 7), strides=(1, 2, 2), padding=(3, 3, 3),
                         kernel_init=kaiming_out, dtype=self.dtype,
                         name="conv1")(x)
        x = _bn(self.dtype, "bn1")(x, use_running_average=deterministic)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 1)] * 3)

        inplanes = 64
        for i, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                s = stride if j == 0 else 1
                needs_proj = j == 0 and (
                    s != 1 or inplanes != planes * expansion
                )
                x = block_cls(
                    planes=planes,
                    stride=s,
                    shortcut_type=self.shortcut_type,
                    needs_projection=needs_proj,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_block{j}",
                )(x, deterministic)
                inplanes = planes * expansion

        x = x.mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))
        x = nn.Dropout(self.head_dropout)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
        return logits


def resnet_from_config(cfg, dtype=jnp.float32, variant: str | None = None):
    """ResNet3DMedical equivalent: the IMG_SIZE->sample_size mapping of the
    reference wrapper (resnet_3d.py:269-323) only parameterized legacy
    fixed-size pooling; with mean pooling it is shape-agnostic. Head dropout
    comes from DROPOUT (configs/resnet-*: 0.1). The variant defaults to
    resnet18 like the reference trainer (train_transformer.py:2078) but is
    overridable via the RESNET_VARIANT config key (the reference exposes
    resnet10..200 factories, resnet_3d.py:224-357)."""
    variant = variant or cfg.get("RESNET_VARIANT", "resnet18")
    block, layers = RESNET_LAYERS[variant]
    return ResNet3D(
        in_channels=int(cfg.get("IN_CHANNELS", 1)),
        block=block,
        layers=layers,
        num_classes=cfg.num_classes,
        shortcut_type="B",
        head_dropout=float(cfg.DROPOUT),
        dtype=dtype,
    )
