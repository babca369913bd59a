"""MedViT V1 3D — hybrid conv/transformer for medical image classification.

Capability parity with reference models/medvit_3d.py + modules/medvit_utils.py:
4-conv stem (stride 2,1,1,2); stages mixing ECB (Multi-Head Convolutional
Attention + locality feed-forward with SE) and LTB (spatial-reduction E-MHSA
branch ‖ MHCA branch, channel-concat, LFF); BatchNorm3d everywhere
(eps 1e-5); S/B/L presets (medvit_3d.py:39-58, 671-716).

Stage pattern (medvit_3d.py:526-538):
  stage 1: ECB * d0 ; stage 2: ECB*(d1-1) + LTB ;
  stage 3: (ECB*4 + LTB) * (d2//5) ; stage 4: ECB*(d3-1) + LTB.

TPU-first:
  * channels-last NDHWC; BN stats in the ``batch_stats`` collection (SyncBN
    is automatic under the global-view jit);
  * E-MHSA's AvgPool1d KV reduction over flattened tokens
    (medvit_utils.py:634-695) is a reshape+mean — static shapes, no windows;
  * the BN-merge inference optimization (merge_pre_bn, medvit_utils.py:11-88)
    is unnecessary here: XLA constant-folds BN affine transforms into the
    adjacent convolutions at compile time when running in inference mode.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsn_tpu.models.layers import ResidualBranch, stochastic_depth_rates, trunc_normal_init
from vsn_tpu.ops.stable_init import compute_residual_gains

NORM_EPS = 1e-5

# Presets (reference medvit_3d.py:39-58 _MEDVITV1_CONFIGS)
MEDVIT_CONFIGS = {
    "S": dict(stem_chs=[64, 32, 64], depths=[3, 4, 10, 3],
              dims=[96, 192, 256, 384, 512, 768], stochastic_depth_prob=0.1),
    "B": dict(stem_chs=[64, 32, 64], depths=[3, 4, 20, 3],
              dims=[96, 192, 256, 384, 512, 768], stochastic_depth_prob=0.2),
    "L": dict(stem_chs=[64, 32, 64], depths=[3, 4, 30, 3],
              dims=[96, 192, 256, 384, 512, 768], stochastic_depth_prob=0.2),
}


def make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """Round to a multiple of divisor without dropping below 90% of v
    (reference medvit_utils.py:91-110)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


def _bn(dtype, name=None):
    return nn.BatchNorm(
        use_running_average=None, momentum=0.9, epsilon=NORM_EPS,
        dtype=dtype, name=name,
    )


def avg_pool_ceil(x, strides: Tuple[int, int, int]):
    """AvgPool3d(kernel=stride, ceil_mode=True, count_include_pad=False):
    pad spatial dims up to a stride multiple, average only valid voxels."""
    b, d, h, w, c = x.shape
    sd, sh, sw = strides
    pads = [(s - dim % s) % s for dim, s in zip((d, h, w), strides)]
    if any(pads):
        x = jnp.pad(x, [(0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)])
        ones = jnp.pad(
            jnp.ones((1, d, h, w, 1), x.dtype),
            [(0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)],
        )
    else:
        ones = None
    dp, hp, wp = x.shape[1:4]
    x = x.reshape(b, dp // sd, sd, hp // sh, sh, wp // sw, sw, c)
    summed = x.sum(axis=(2, 4, 6))
    if ones is None:
        return summed / (sd * sh * sw)
    counts = ones.reshape(1, dp // sd, sd, hp // sh, sh, wp // sw, sw, 1).sum(
        axis=(2, 4, 6)
    )
    return summed / counts


class ConvBNReLU(nn.Module):
    """Conv3d + BN + ReLU (reference medvit_utils.py:265-316)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel_size
        if self.groups == 1:
            # Pallas im2col on TPU when C_in is tiny (stem0's C_in=1 3^3
            # stride-2 conv otherwise contracts K=1 on the MXU — see
            # vsn_tpu/ops/stem_im2col.py); plain conv otherwise. Param
            # tree identical to nn.Conv.
            from vsn_tpu.ops.conv_unfold import UnfoldedConv

            x = UnfoldedConv(
                self.features, (k, k, k), strides=(self.stride,) * 3,
                padding=(k // 2,) * 3, kernel_init=trunc_normal_init(0.02),
                dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features, (k, k, k), (self.stride,) * 3, padding=k // 2,
                feature_group_count=self.groups, use_bias=False,
                kernel_init=trunc_normal_init(0.02), dtype=self.dtype,
                name="conv",
            )(x)
        x = _bn(self.dtype, "norm")(x, use_running_average=deterministic)
        return nn.relu(x)


class PatchEmbedAvg(nn.Module):
    """Avg-pool downsample + 1x1 conv channel adjust (medvit_utils.py:319-374)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        if self.stride > 1:
            x = avg_pool_ceil(x, (self.stride,) * 3)
        if self.stride > 1 or in_features != self.features:
            x = nn.Conv(
                self.features, (1, 1, 1), use_bias=False,
                kernel_init=trunc_normal_init(0.02), dtype=self.dtype,
                name="conv",
            )(x)
            x = _bn(self.dtype, "norm")(x, use_running_average=deterministic)
        return x


class MHCA(nn.Module):
    """Multi-Head Convolutional Attention: grouped 3^3 conv + BN + ReLU +
    1x1 projection (medvit_utils.py:377-419)."""

    head_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.Conv(
            c, (3, 3, 3), padding=1, feature_group_count=c // self.head_dim,
            use_bias=False, kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype, name="group_conv",
        )(x)
        y = _bn(self.dtype, "norm")(y, use_running_average=deterministic)
        y = nn.relu(y)
        y = nn.Conv(
            c, (1, 1, 1), use_bias=False, kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype, name="projection",
        )(y)
        return y


class SELayer(nn.Module):
    """Squeeze-excitation with hard-sigmoid gate (medvit_utils.py:225-257)."""

    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2, 3))
        y = nn.Dense(max(1, c // self.reduction), dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        y = h_sigmoid(y)
        return x * y[:, None, None, None, :]


class ECALayer(nn.Module):
    """Efficient channel attention: 1D conv over pooled channel descriptor
    (medvit_utils.py:175-222)."""

    gamma: int = 2
    b: int = 1
    sigmoid_type: str = "sigmoid"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = int(abs((math.log2(c) + self.b) / self.gamma))
        k = t if t % 2 else t + 1
        y = x.mean(axis=(1, 2, 3))[..., None]  # [B, C, 1]
        y = nn.Conv(1, (k,), padding=k // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(y)
        y = y[..., 0]
        gate = jax.nn.sigmoid(y) if self.sigmoid_type == "sigmoid" else h_sigmoid(y)
        return x * gate[:, None, None, None, :]


class LocalityFeedForward(nn.Module):
    """Inverted-residual FFN: 1x1 expand -> BN -> h_swish -> depthwise 3^3 ->
    BN -> h_swish -> SE -> 1x1 project -> BN, with residual
    (medvit_utils.py:427-532, act='hs+se')."""

    expand_ratio: float = 4.0
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        hidden = int(c * self.expand_ratio)
        y = nn.Conv(hidden, (1, 1, 1), use_bias=False,
                    kernel_init=trunc_normal_init(0.02), dtype=self.dtype,
                    name="expand")(x)
        y = _bn(self.dtype, "bn1")(y, use_running_average=deterministic)
        y = h_swish(y)
        # Depthwise conv as VPU shift-FMAs on TPU: the grouped-conv
        # lowering contracts K=1 on the MXU (see vsn_tpu/ops/conv_unfold).
        from vsn_tpu.ops.conv_unfold import DepthwiseConv

        y = DepthwiseConv((3, 3, 3), kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="dwconv")(y)
        y = _bn(self.dtype, "bn2")(y, use_running_average=deterministic)
        y = h_swish(y)
        y = SELayer(reduction=self.reduction, dtype=self.dtype, name="se")(y)
        y = nn.Conv(c, (1, 1, 1), use_bias=False,
                    kernel_init=trunc_normal_init(0.02), dtype=self.dtype,
                    name="project")(y)
        y = _bn(self.dtype, "bn3")(y, use_running_average=deterministic)
        return x + y


class EMHSA(nn.Module):
    """Efficient MHSA with token-axis avg-pool KV reduction + BN
    (medvit_utils.py:594-705). Operates on flattened tokens [B, N, C]."""

    head_dim: int = 32
    sr_ratio: int = 1
    qkv_bias: bool = True
    attention_dropout: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        num_heads = c // self.head_dim
        scale = self.head_dim**-0.5
        dense = lambda name: nn.Dense(
            c, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02), name=name,
        )
        q = dense("q")(x).reshape(b, n, num_heads, self.head_dim).transpose(
            0, 2, 1, 3
        )

        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio**2  # N_ratio: 1-D pool over flattened tokens
            n_red = n // r
            kv_in = x[:, : n_red * r].reshape(b, n_red, r, c).mean(axis=2)
            kv_in = _bn(self.dtype, "sr_norm")(
                kv_in, use_running_average=deterministic
            )
        m = kv_in.shape[1]
        k = dense("k")(kv_in).reshape(b, m, num_heads, self.head_dim).transpose(
            0, 2, 3, 1
        )
        v = dense("v")(kv_in).reshape(b, m, num_heads, self.head_dim).transpose(
            0, 2, 1, 3
        )

        attn = jnp.einsum(
            "bhnd,bhdm->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attention_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(
            c, dtype=self.dtype, kernel_init=trunc_normal_init(0.02), name="proj"
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class ECB(nn.Module):
    """Efficient Convolution Block (reference medvit_3d.py:66-217):
    PatchEmbed -> [BN -> MHCA -> LS -> droppath -> +res] ->
    [BN -> LFF(residual inside)] with the LFF residual being part of LFF."""

    out_channels: int
    stride: int = 1
    drop_path_rate: float = 0.0
    head_dim: int = 32
    mlp_ratio: float = 3.0
    residual_kw: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rkw = dict(self.residual_kw or {})
        x = PatchEmbedAvg(self.out_channels, self.stride, dtype=self.dtype,
                          name="patch_embed")(x, deterministic)
        out = _bn(self.dtype, "norm1")(x, use_running_average=deterministic)
        attn = MHCA(self.head_dim, dtype=self.dtype, name="mhca")(
            out, deterministic
        )
        x = ResidualBranch(
            drop_path_rate=self.drop_path_rate, dtype=self.dtype, **rkw,
            name="res1",
        )(x, attn, deterministic)
        out = _bn(self.dtype, "norm2")(x, use_running_average=deterministic)
        # NOTE the reference feeds norm2(x) into the LFF whose *internal*
        # residual adds norm2(x), then applies droppath and adds x again
        # (medvit_3d.py:198-215 — ffn_out includes the normed shortcut).
        ffn = LocalityFeedForward(
            expand_ratio=self.mlp_ratio, reduction=self.out_channels,
            dtype=self.dtype, name="lff",
        )(out, deterministic)
        x = ResidualBranch(
            drop_path_rate=self.drop_path_rate, dtype=self.dtype, **rkw,
            name="res2",
        )(x, ffn, deterministic)
        return x


class LTB(nn.Module):
    """Local Transformer Block (reference medvit_3d.py:220-433): E-MHSA
    branch, then MHCA branch on a projection, channel-concat, then LFF."""

    out_channels: int
    stride: int = 1
    sr_ratio: int = 1
    drop_path_rate: float = 0.0
    head_dim: int = 32
    mlp_ratio: float = 2.0
    mix_block_ratio: float = 0.75
    attention_dropout: float = 0.0
    dropout: float = 0.0
    residual_kw: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rkw = dict(self.residual_kw or {})
        mhsa_ch = make_divisible(int(self.out_channels * self.mix_block_ratio), 32)
        mhca_ch = self.out_channels - mhsa_ch
        if mhca_ch <= 0:
            raise ValueError(
                f"LTB out_channels={self.out_channels} leaves no MHCA branch "
                f"(mhsa={mhsa_ch}); pick channels whose "
                f"make_divisible(c*{self.mix_block_ratio}, 32) < c"
            )

        x = PatchEmbedAvg(mhsa_ch, self.stride, dtype=self.dtype,
                          name="patch_embed")(x, deterministic)
        b, d, h, w, c = x.shape

        out = _bn(self.dtype, "norm1")(x, use_running_average=deterministic)
        tokens = out.reshape(b, d * h * w, c)
        mhsa = EMHSA(
            head_dim=self.head_dim, sr_ratio=self.sr_ratio,
            attention_dropout=self.attention_dropout, proj_drop=self.dropout,
            dtype=self.dtype, name="e_mhsa",
        )(tokens, deterministic)
        mhsa = mhsa.reshape(b, d, h, w, c)
        x = ResidualBranch(
            drop_path_rate=self.drop_path_rate * self.mix_block_ratio,
            dtype=self.dtype, **rkw, name="res_mhsa",
        )(x, mhsa, deterministic)

        out = PatchEmbedAvg(mhca_ch, 1, dtype=self.dtype, name="projection")(
            x, deterministic
        )
        mhca = MHCA(self.head_dim, dtype=self.dtype, name="mhca")(
            out, deterministic
        )
        out = ResidualBranch(
            drop_path_rate=self.drop_path_rate * (1 - self.mix_block_ratio),
            dtype=self.dtype, **rkw, name="res_mhca",
        )(out, mhca, deterministic)

        x = jnp.concatenate([x, out], axis=-1)

        ffn_in = _bn(self.dtype, "norm2")(x, use_running_average=deterministic)
        ffn = LocalityFeedForward(
            expand_ratio=self.mlp_ratio, reduction=self.out_channels,
            dtype=self.dtype, name="lff",
        )(ffn_in, deterministic)
        x = ResidualBranch(
            drop_path_rate=self.drop_path_rate, dtype=self.dtype, **rkw,
            name="res_ffn",
        )(x, ffn, deterministic)
        return x


class MedViT3D(nn.Module):
    """MedViT V1 classifier (reference medvit_3d.py:441-663)."""

    num_classes: int
    stem_chs: Sequence[int] = (64, 32, 64)
    depths: Sequence[int] = (3, 4, 10, 3)
    dims: Sequence[int] = (96, 192, 256, 384, 512, 768)
    strides: Sequence[int] = (1, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    head_dim: int = 32
    mlp_ratio: float = 3.0
    mix_block_ratio: float = 0.75
    stochastic_depth_prob: float = 0.1
    attention_dropout: float = 0.0
    dropout: float = 0.0
    use_checkpoint: bool = False
    enable_stable: bool = False
    stable_k: float = 2.0
    stable_alpha: float = 1.0
    use_shakedrop: bool = False
    shakedrop_alpha_range: Tuple[float, float] = (-1.0, 1.0)
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.depths[2] % 5 != 0:
            raise ValueError("depths[2] must be a multiple of 5 (stage-3 pattern)")
        x = x.astype(self.dtype)
        dims = list(self.dims)
        # stage channel/type schedule (medvit_3d.py:526-538)
        stage_channels = [
            [dims[0]] * self.depths[0],
            [dims[1]] * (self.depths[1] - 1) + [dims[2]],
            [dims[3], dims[3], dims[3], dims[3], dims[4]]
            * (self.depths[2] // 5),
            [dims[5]] * self.depths[3],
        ]
        stage_types = [
            ["ECB"] * self.depths[0],
            ["ECB"] * (self.depths[1] - 1) + ["LTB"],
            ["ECB", "ECB", "ECB", "ECB", "LTB"] * (self.depths[2] // 5),
            ["ECB"] * (self.depths[3] - 1) + ["LTB"],
        ]

        if self.enable_stable:
            lam, beta = compute_residual_gains(
                sum(self.depths), self.stable_k, self.stable_alpha
            )
        else:
            lam, beta = 1.0, 0.0
        residual_kw = dict(
            use_shakedrop=self.use_shakedrop,
            shakedrop_alpha_range=tuple(self.shakedrop_alpha_range),
            layer_scale=self.layer_scale,
            layer_scale_init_value=self.layer_scale_init_value,
            enable_stable=self.enable_stable,
            stable_lam=lam,
            stable_beta=beta,
        )

        # stem: stride 2, 1, 1, 2 (medvit_3d.py:543-549)
        for i, (ch, s) in enumerate(
            zip([self.stem_chs[0], self.stem_chs[1], self.stem_chs[2],
                 self.stem_chs[2]], [2, 1, 1, 2])
        ):
            x = ConvBNReLU(ch, 3, s, dtype=self.dtype, name=f"stem{i}")(
                x, deterministic
            )

        dpr = stochastic_depth_rates(self.stochastic_depth_prob, self.depths)
        idx = 0
        for stage_id, depth in enumerate(self.depths):
            for block_id in range(depth):
                stride = 2 if (self.strides[stage_id] == 2 and block_id == 0) else 1
                out_ch = stage_channels[stage_id][block_id]
                kind = stage_types[stage_id][block_id]
                common = dict(
                    out_channels=out_ch,
                    stride=stride,
                    drop_path_rate=dpr[idx],
                    head_dim=self.head_dim,
                    mlp_ratio=self.mlp_ratio,
                    residual_kw=residual_kw,
                    dtype=self.dtype,
                )
                if kind == "ECB":
                    block = ECB(**common, name=f"s{stage_id}_b{block_id}_ecb")
                else:
                    block = LTB(
                        **common,
                        sr_ratio=self.sr_ratios[stage_id],
                        mix_block_ratio=self.mix_block_ratio,
                        attention_dropout=self.attention_dropout,
                        dropout=self.dropout,
                        name=f"s{stage_id}_b{block_id}_ltb",
                    )
                x = block(x, deterministic)
                idx += 1

        x = _bn(self.dtype, "norm")(x, use_running_average=deterministic)
        x = x.mean(axis=(1, 2, 3))
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02), name="proj_head",
        )(x.astype(jnp.float32))
        return logits


def medvit_from_config(cfg, dtype=jnp.float32) -> MedViT3D:
    """Build from public config keys: DEPTH=[3,4,10,3], HEADS -> head_dim,
    MLP_RATIO=3 (configs/medvit-*; reference train_transformer.py:2058-2087
    passes head_dim=HEADS for MedViT)."""
    return MedViT3D(
        num_classes=cfg.num_classes,
        depths=tuple(cfg.DEPTH),
        head_dim=int(cfg.HEADS),
        mlp_ratio=float(cfg.MLP_RATIO),
        stochastic_depth_prob=float(cfg.STOCHASTIC_DEPTH_PROB),
        attention_dropout=float(cfg.ATTENTION_DROPOUT),
        dropout=float(cfg.DROPOUT),
        use_checkpoint=bool(cfg.USE_CHECKPOINT),
        enable_stable=bool(cfg.ENABLE_STABLE),
        stable_k=float(cfg.STABLE_K),
        stable_alpha=float(cfg.STABLE_ALPHA),
        use_shakedrop=bool(cfg.USE_SHAKEDROP),
        shakedrop_alpha_range=tuple(cfg.SHAKEDROP_ALPHA_RANGE),
        layer_scale=bool(cfg.LAYER_SCALE),
        layer_scale_init_value=float(cfg.LAYER_SCALE_INIT_VALUE),
        dtype=dtype,
    )
