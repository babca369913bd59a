"""3D Vision Transformer (plain full-attention ViT).

Capability parity with reference models/vit_3d.py (lucidrains-derived): patchify
via reshape -> LN -> Linear -> LN, learned positional embedding + CLS token,
depth x (MHSA + FFN) with pre-/post-norm, DropPath, LayerScale, DeepScaleLM
stable residuals, cls or mean pooling; S/B/L/H presets (vit_3d.py:19-48,
460-527).

TPU-first design choices:
  * patchify is a pure reshape/transpose (no gather) feeding one big matmul —
    the whole embed path is a single MXU-friendly ``[B*N, patch_dim] @
    [patch_dim, D]``;
  * attention uses ``jnp.einsum`` with f32 softmax accumulation; at 810 tokens
    (144x160x144 / 16^3) XLA fuses this well on the MXU without a custom
    kernel;
  * the block stack is a Python loop over compact modules — depth is static,
    XLA unrolls and pipelines it; ``USE_CHECKPOINT`` maps to ``nn.remat``.
"""

from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsn_tpu.models.layers import (
    Mlp,
    ResidualBranch,
    make_norm,
    stochastic_depth_rates,
    trunc_normal_init,
)
from vsn_tpu.ops.stable_init import (
    compute_residual_gains,
    normal_init,
    stable_embedding_std,
    stable_qkv_init,
    stable_vproj_std,
)

# Preset table mirroring reference models/vit_3d.py:19-48 (_VIT_CONFIGS).
VIT_CONFIGS = {
    "S": dict(depth=12, num_heads=6, embed_dim=384),
    "B": dict(depth=12, num_heads=12, embed_dim=768),
    "L": dict(depth=24, num_heads=16, embed_dim=1024),
    "H": dict(depth=32, num_heads=16, embed_dim=1280),
}


class ViTAttention(nn.Module):
    """Multi-head self-attention with explicit head dim.

    Matches reference vit_3d.py:81-143: qkv is bias-free, output projection
    only when (heads, dim_head) != (1, dim). Pre-norm applies LN inside the
    attention module (as the reference does); post-norm skips it.
    """

    heads: int
    dim_head: int
    dropout: float = 0.0
    post_norm: bool = False
    norm_ctor: Optional[callable] = None
    dtype: jnp.dtype = jnp.float32
    enable_stable: bool = False
    stable_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == dim)

        if not self.post_norm:
            norm = (self.norm_ctor or make_norm(None, self.dtype))(name="norm")
            x = norm(x)

        if self.enable_stable:
            qkv_init = stable_qkv_init(dim, self.stable_dropout)
        else:
            qkv_init = trunc_normal_init(0.02)
        qkv = nn.Dense(
            inner * 3, use_bias=False, dtype=self.dtype, kernel_init=qkv_init,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        scale = self.dim_head**-0.5
        attn = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * scale
        # saturation observability for the fused kernel's logit clamp at 80
        # (see swin3d.WindowAttention3D); no-op unless 'intermediates' is
        # mutable (the WATCH_GRADIENTS probe forward, train/step.py)
        self.sow("intermediates", "attn_logit_max", jnp.max(attn),
                 reduce_fn=lambda a, b: jnp.maximum(a, b),
                 init_fn=lambda: jnp.float32(-jnp.inf))
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhij,bhjd->bhid", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)

        if project_out:
            proj_init = (
                normal_init(stable_vproj_std(inner, self.stable_dropout))
                if self.enable_stable
                else trunc_normal_init(0.02)
            )
            out = nn.Dense(
                dim, dtype=self.dtype, kernel_init=proj_init, name="proj"
            )(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class _ViTAttnParams(nn.Module):
    """ViTAttention-compatible params (norm/qkv/proj) for the fused-kernel
    path — declared without applying so the param tree is bit-identical to
    the unfused module tree (checkpoints interoperate). Only valid when
    heads * dim_head == dim (true for every preset) so wqkv is [C, 3C]."""

    dim: int
    enable_stable: bool
    attn_dropout: float
    post_norm: bool = False

    @nn.compact
    def __call__(self):
        from vsn_tpu.models.swin3d import _DenseParams, _NormParams

        # post-norm ViTAttention has no internal pre-norm; the block-level
        # "attn_norm" module (declared by the caller) takes its place
        lng = lnb = None
        if not self.post_norm:
            lng, lnb = _NormParams(self.dim, name="norm")()
        qkv_init = (
            stable_qkv_init(self.dim, self.attn_dropout)
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        wqkv, bqkv = _DenseParams(
            self.dim, 3 * self.dim, use_bias=False, kernel_init=qkv_init,
            name="qkv",
        )()
        proj_init = (
            normal_init(stable_vproj_std(self.dim, self.attn_dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        wproj, bproj = _DenseParams(
            self.dim, self.dim, use_bias=True, kernel_init=proj_init,
            name="proj",
        )()
        return lng, lnb, wqkv, bqkv, wproj, bproj


class ViTBlock(nn.Module):
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    drop_path_rate: float = 0.0
    post_norm: bool = False
    norm_ctor: Optional[callable] = None
    norm_layer_name: Optional[str] = None
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    enable_stable: bool = False
    stable_lam: float = 1.0
    stable_beta: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        norm_ctor = self.norm_ctor or make_norm(None, self.dtype)
        residual_kw = dict(
            drop_path_rate=self.drop_path_rate,
            layer_scale=self.layer_scale,
            layer_scale_init_value=self.layer_scale_init_value,
            enable_stable=self.enable_stable,
            stable_lam=self.stable_lam,
            stable_beta=self.stable_beta,
            dtype=self.dtype,
        )

        if self._fused_attn_ok(x.shape[-1], x.shape[1], deterministic):
            x = self._fused_attn_half(x, deterministic)
        else:
            attn_out = ViTAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.attention_dropout,
                post_norm=self.post_norm,
                norm_ctor=norm_ctor,
                dtype=self.dtype,
                enable_stable=self.enable_stable,
                stable_dropout=self.attention_dropout,
                name="attn",
            )(x, deterministic)
            if self.post_norm:
                attn_out = norm_ctor(name="attn_norm")(attn_out)
            x = ResidualBranch(**residual_kw, name="res1")(
                x, attn_out, deterministic)

        if self._fused_mlp_ok(deterministic):
            return self._fused_mlp_half(x, deterministic)

        h = x if self.post_norm else norm_ctor(name="ff_prenorm")(x)
        mlp_kernel_init = (
            normal_init(stable_vproj_std(x.shape[-1], self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        ff_out = Mlp(
            hidden_features=self.mlp_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            kernel_init=mlp_kernel_init,
            name="mlp",
        )(h, deterministic)
        if self.post_norm:
            ff_out = norm_ctor(name="ff_norm")(ff_out)
        x = ResidualBranch(**residual_kw, name="res2")(x, ff_out, deterministic)
        return x

    def _fused_attn_ok(self, c: int, t: int,
                       deterministic: bool = False) -> bool:
        """Static gate for the fused attention-half kernel (bias=None form
        of vsn_tpu/ops/swin_block_kernels.py:fused_attn_half — full-sequence
        attention is window attention with one 811-token window and no
        relative-position bias; VERDICT round 1 item 4)."""
        from vsn_tpu.ops.swin_block_kernels import attn_half_vmem_ok

        inner = self.heads * self.dim_head
        return (
            self.use_pallas
            and self.norm_layer_name in (None, False, "nn.LayerNorm",
                                         "LayerNorm")
            and (deterministic
                 or (self.dropout == 0.0 and self.attention_dropout == 0.0))
            and inner == c
            and not (self.heads == 1 and self.dim_head == c)
            and attn_half_vmem_ok(c, t, self.heads, with_bias=False)
            and jax.devices()[0].platform == "tpu"
        )

    def _fused_attn_half(self, x, deterministic):
        """LN + qkv + softmax attention + proj + gated residual as one
        Pallas kernel (reference vit_3d.py:81-143 attention semantics)."""
        from vsn_tpu.models.layers import residual_branch_gains
        from vsn_tpu.models.swin3d import _ResDecor
        from vsn_tpu.ops.swin_block_kernels import fused_attn_half

        b, t, c = x.shape
        lng, lnb, wqkv, bqkv, wproj, bproj = _ViTAttnParams(
            dim=c, enable_stable=self.enable_stable,
            attn_dropout=self.attention_dropout,
            post_norm=self.post_norm, name="attn",
        )()
        if self.post_norm:
            from vsn_tpu.models.swin3d import _NormParams

            lng, lnb = _NormParams(c, name="attn_norm")()
        rng, gamma = self._res_decor(c, deterministic, "res1")
        gf, gb = residual_branch_gains(
            b, self.drop_path_rate, False, (-1.0, 1.0), deterministic, rng
        )
        beta = self.stable_beta if self.enable_stable else 1.0
        gf, gb = gf * beta, gb * beta
        lam = float(self.stable_lam) if self.enable_stable else 1.0
        ids = None  # statically maskless full-sequence attention
        scale = self.dim_head**-0.5
        out = fused_attn_half(
            x, lng, lnb, wqkv, bqkv, None, ids, wproj, bproj,
            gf, gb, scale, self.heads, lam, gamma=gamma,
            post_norm=self.post_norm,
        )
        return out.astype(self.dtype)

    def _res_decor(self, c, deterministic, name):
        """rng + optional LayerScale gamma at the unfused fold paths/tree."""
        from vsn_tpu.models.swin3d import _ResDecor

        needs_rng = self.drop_path_rate > 0.0 and not deterministic
        if needs_rng or self.layer_scale:
            return _ResDecor(
                stream="dropout", draw=needs_rng,
                ls_dim=c if self.layer_scale else 0,
                ls_init=self.layer_scale_init_value, name=name,
            )()
        return None, None

    def _fused_mlp_ok(self, deterministic: bool = False) -> bool:
        """Static gate mirroring SwinBlock3D._fused_ok: the fused LN+MLP
        Pallas kernel (vsn_tpu/ops/swin_block_kernels.py:fused_ln_mlp,
        reusable per VERDICT round 1 item 4 — ViT's MLP halves are
        shape-identical to Swin's [T, C] form) applies for LayerNorm, zero
        dropout (or any dropout at deterministic eval, where it is a
        no-op), on TPU."""
        return (
            self.use_pallas
            and self.norm_layer_name in (None, False, "nn.LayerNorm",
                                         "LayerNorm")
            and (deterministic or self.dropout == 0.0)
            and jax.devices()[0].platform == "tpu"
        )

    def _fused_mlp_half(self, x, deterministic):
        """LN + fc1 + GELU + fc2 + gated residual as one Pallas kernel.

        Declares a param tree bit-identical to the unfused
        ff_prenorm/mlp/res2 modules (checkpoints interoperate). The token
        count (n_tokens + CLS = e.g. 811) is padded up to a multiple of 8
        so a tile divides the per-sample rows; pad rows are sliced off.
        """
        from vsn_tpu.models.layers import residual_branch_gains
        from vsn_tpu.models.swin3d import _MlpParams, _NormParams
        from vsn_tpu.ops.swin_block_kernels import (
            fused_ln_mlp,
            mlp_tiling,
        )

        b, t, c = x.shape
        lng, lnb = _NormParams(
            c, name="ff_norm" if self.post_norm else "ff_prenorm")()
        mlp_kernel_init = (
            normal_init(stable_vproj_std(c, self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        w1, b1, w2, b2 = _MlpParams(
            dim=c, hidden=self.mlp_dim, kernel_init=mlp_kernel_init,
            name="mlp",
        )()
        rng, gamma = self._res_decor(c, deterministic, "res2")
        gf, gb = residual_branch_gains(
            b, self.drop_path_rate, False, (-1.0, 1.0), deterministic, rng
        )
        beta = self.stable_beta if self.enable_stable else 1.0
        gf, gb = gf * beta, gb * beta
        lam = float(self.stable_lam) if self.enable_stable else 1.0

        tile, pad_rows = mlp_tiling(t, c, self.mlp_dim)
        t_pad = t + pad_rows
        if tile:
            xp = (
                jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])
                if t_pad != t else x
            )
            flat = xp.reshape(b * t_pad, c)
            out = fused_ln_mlp(
                flat, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam,
                gamma=gamma, post_norm=self.post_norm,
            ).reshape(b, t_pad, c)[:, :t]
            return out.astype(self.dtype)
        # same math via XLA on the declared params
        from vsn_tpu.models.layers import gated_residual
        from vsn_tpu.models.swin3d import _apply_layernorm

        y = x if self.post_norm else _apply_layernorm(x, lng, lnb,
                                                      self.dtype)
        h1 = jnp.dot(y, w1.astype(self.dtype)) + b1.astype(self.dtype)
        hact = nn.gelu(h1.astype(jnp.float32), approximate=False)
        ff = (
            jnp.dot(hact.astype(self.dtype), w2.astype(self.dtype))
            + b2.astype(self.dtype)
        )
        if self.post_norm:
            ff = _apply_layernorm(ff, lng, lnb, self.dtype)
        if gamma is not None:
            ff = (ff.astype(jnp.float32) * gamma).astype(self.dtype)
        return gated_residual(x, ff, gf, gb, lam).astype(self.dtype)


class ViT3D(nn.Module):
    """Plain 3D ViT classifier (reference models/vit_3d.py:288-457)."""

    img_size: Tuple[int, int, int]
    patch_size: Tuple[int, int, int]
    num_classes: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_dim: int
    pool: Literal["cls", "mean"] = "cls"
    in_channels: int = 1
    dim_head: int = 64
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    use_checkpoint: bool = False
    enable_stable: bool = False
    stable_k: float = 2.0
    stable_alpha: float = 1.0
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    post_norm: bool = False
    norm_layer: Optional[str] = None
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        for i, p in zip(self.img_size, self.patch_size):
            if i % p != 0:
                raise ValueError(
                    f"img_size {self.img_size} not divisible by patch {self.patch_size}"
                )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, D, H, W, C] (channels-last throughout — TPU conv/matmul layout)
        b = x.shape[0]
        pd, ph, pw = self.patch_size
        gd, gh, gw = (s // p for s, p in zip(self.img_size, self.patch_size))
        n = gd * gh * gw
        patch_dim = self.in_channels * pd * ph * pw

        norm_ctor = make_norm(self.norm_layer, self.dtype)

        # Patchify: reshape+transpose, then LN -> Linear -> LN
        # (reference vit_3d.py:424-431 to_patch_embedding).
        x = x.astype(self.dtype)
        x = x.reshape(b, gd, pd, gh, ph, gw, pw, self.in_channels)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n, patch_dim)
        x = norm_ctor(name="patch_norm1")(x)
        embed_init = (
            normal_init(stable_embedding_std(patch_dim, self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        x = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=embed_init,
            name="patch_proj",
        )(x)
        x = norm_ctor(name="patch_norm2")(x)

        # CLS token + learned position embedding (randn init, vit_3d.py:433-434)
        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.embed_dim),
            jnp.float32,
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, n + 1, self.embed_dim),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(self.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if self.enable_stable:
            stable_lam, stable_beta = compute_residual_gains(
                self.depth, self.stable_k, self.stable_alpha
            )
        else:
            stable_lam, stable_beta = 1.0, 0.0

        dpr = stochastic_depth_rates(self.stochastic_depth_prob, [self.depth])
        block_cls = ViTBlock
        if self.use_checkpoint:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                heads=self.num_heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                drop_path_rate=dpr[i],
                post_norm=self.post_norm,
                norm_ctor=norm_ctor,
                norm_layer_name=self.norm_layer,
                use_pallas=self.use_pallas,
                layer_scale=self.layer_scale,
                layer_scale_init_value=self.layer_scale_init_value,
                enable_stable=self.enable_stable,
                stable_lam=stable_lam,
                stable_beta=stable_beta,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic)

        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        x = norm_ctor(name="head_norm")(x)
        logits = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02),
            name="head",
        )(x.astype(jnp.float32))
        return logits


def vit_from_config(cfg, dtype=jnp.float32) -> ViT3D:
    """Build a ViT3D from the public config keys.

    The reference maps EMBED_DIM/DEPTH/HEADS straight into the ViT constructor
    with mlp_dim = EMBED_DIM * MLP_RATIO (train/train_transformer.py:2024-2056).
    """
    img = cfg.input_size
    return ViT3D(
        in_channels=int(cfg.get("IN_CHANNELS", 1)),
        img_size=img,
        patch_size=tuple(cfg.PATCH_SHAPE),
        num_classes=cfg.num_classes,
        embed_dim=int(cfg.EMBED_DIM),
        depth=int(cfg.DEPTH),
        num_heads=int(cfg.HEADS),
        mlp_dim=int(cfg.EMBED_DIM * cfg.MLP_RATIO),
        dropout=float(cfg.DROPOUT),
        attention_dropout=float(cfg.ATTENTION_DROPOUT),
        stochastic_depth_prob=float(cfg.STOCHASTIC_DEPTH_PROB),
        use_checkpoint=bool(cfg.USE_CHECKPOINT),
        enable_stable=bool(cfg.ENABLE_STABLE),
        stable_k=float(cfg.STABLE_K),
        stable_alpha=float(cfg.STABLE_ALPHA),
        layer_scale=bool(cfg.LAYER_SCALE),
        layer_scale_init_value=float(cfg.LAYER_SCALE_INIT_VALUE),
        post_norm=bool(cfg.POST_NORM),
        norm_layer=cfg.NORM_LAYER,
        use_pallas=bool(cfg.get("USE_PALLAS_ATTENTION", True)),
        dtype=dtype,
    )
