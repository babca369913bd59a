"""Tap-unfolded convolution for tiny-C_in stem convs.

Why: XLA's TPU conv contracts only the input-channel dim per kernel tap,
so a C_in=1 stem conv leaves the 128-wide MXU contracting K=1 — measured
1/128 of peak on the ResNet-18 7^3 stem (154.5 ms forward for 306 GFLOP at
micro 8, `scripts/perf_probe_stem.py`). Zero-padding C_in is a wash (8x
FLOPs at 8x efficiency); the real fix is to move kernel TAPS into the
contraction.

This module rewrites ``conv(x, k, strides, pad)`` exactly when every
spatial stride is 1 or 2:

  * each stride-2 axis is space-to-depth'd (reshape+transpose — no
    strided slices, whose backward has faulted the TPU worker before;
    see models/swin3d.py PatchMerging note) after static edge padding;
  * each of that axis's kernel taps becomes a (shift, parity) pair — a
    contiguous static slice of the s2d tensor at a channel offset;
  * the tap slices concatenate into an unfolded channel dim, and the
    remaining stride-1 axes stay ordinary conv taps.

ResNet-18 stem (7,7,7)/(1,2,2): conv over [*, 49] channels with a (7,1,1)
kernel — per-tap contraction K=49. MedViT stem0 (3,3,3)/(2,2,2): all axes
unfold, leaving a pure [M, 27] @ [27, C_out] matmul. Both are exact
reformulations (same params, same math up to float summation order).

MEASURED FAILURE at production geometry (2026-08-19, /tmp/q_arch.log):
XLA materializes every tap slice in HBM with its 1-2-wide channel dim on
the 128 lanes — 85-170x tile padding, 3.4 GB per slice, 100 GB total →
compile OOM. ``tap_unfolded_conv`` is therefore OPT-IN ONLY
(VSN_UNFOLD_STEM=1, for small-geometry A/Bs); the production stem path is
the VMEM-only Pallas im2col kernel in ``ops/stem_im2col.py``, which
``UnfoldedConv`` routes to on TPU.

Reference stems this accelerates: /root/reference/models/resnet_3d.py:129-137
(conv1) and /root/reference/models/medvit_3d.py:543-549 (stem conv 0).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsn_tpu.utils.flags import env_flag


def should_unfold(strides: Sequence[int], kernel_shape: Sequence[int],
                  c_in: int) -> bool:
    """Profitable + supported: strides in {1,2} with some stride-2 axis,
    tiny C_in (the MXU-starved case), and a modest unfolded channel count."""
    if any(s not in (1, 2) for s in strides):
        return False
    if all(s == 1 for s in strides):
        return False
    unfolded = c_in
    for k, s in zip(kernel_shape, strides):
        if s == 2:
            unfolded *= k
    return c_in <= 2 and unfolded <= 512


def _pad_amounts(size: int, k: int, stride: int, pad: int) -> Tuple[int, int, int]:
    """(lo, hi, out) edge padding and output length for one axis. Stride-2
    axes pad to an even total so the s2d reshape is exact."""
    out = (size + 2 * pad - k) // stride + 1
    lo, hi = pad, pad
    if stride == 2 and (size + lo + hi) % 2:
        hi += 1
    return lo, hi, out


def tap_unfolded_conv(x: jax.Array, kernel: jax.Array,
                      strides: Sequence[int], padding: Sequence[int],
                      dtype=None) -> jax.Array:
    """Exact conv(x, kernel) with stride-2 taps unfolded into channels.

    Args:
        x: [B, D, H, W, C_in].
        kernel: [kd, kh, kw, C_in, C_out] (DHWIO, the nn.Conv layout).
        strides: per-axis stride, each 1 or 2.
        padding: per-axis symmetric edge padding (ints).
        dtype: compute dtype for the final conv/matmul (defaults to x.dtype).
    Returns: [B, outD, outH, outW, C_out] in ``dtype``.
    """
    dt = dtype or x.dtype
    b = x.shape[0]
    c_in = x.shape[-1]
    kd, kh, kw, _, c_out = kernel.shape
    ks = (kd, kh, kw)
    assert all(s in (1, 2) for s in strides), strides

    # --- pad all spatial axes ---
    pads, outs = [], []
    for ax in range(3):
        lo, hi, out = _pad_amounts(x.shape[1 + ax], ks[ax], strides[ax],
                                   int(padding[ax]))
        pads.append((lo, hi))
        outs.append(out)
    x = jnp.pad(x, [(0, 0), *pads, (0, 0)])

    # --- space-to-depth every stride-2 axis (one reshape+transpose) ---
    # [B, D', (2?), H', (2?), W', (2?), C] -> parities move next to C.
    shape, par_axes, spat_axes = [b], [], []
    for ax in range(3):
        if strides[ax] == 2:
            shape.extend([x.shape[1 + ax] // 2, 2])
            spat_axes.append(len(shape) - 2)
            par_axes.append(len(shape) - 1)
        else:
            shape.append(x.shape[1 + ax])
            spat_axes.append(len(shape) - 1)
    shape.append(c_in)
    x = x.reshape(shape)
    x = x.transpose(0, *spat_axes, *par_axes, len(shape) - 1)
    n_par = len(par_axes)
    x = x.reshape(*x.shape[: 4], (2 ** n_par) * c_in)

    # --- unfold taps of stride-2 axes into channels via static slices ---
    # tap dt on a stride-2 axis reads s2d position (o + dt//2) at parity
    # dt%2; stride-1 axes keep all their taps for the residual conv.
    unfold_taps = [range(ks[ax]) if strides[ax] == 2 else (None,)
                   for ax in range(3)]
    # parity stride inside the s2d channel block, per axis (lex order of
    # the transpose above: parities of unfolded axes outer-to-inner).
    par_stride, acc = [], c_in
    for ax in (2, 1, 0):
        if strides[ax] == 2:
            par_stride.insert(0, acc)
            acc *= 2
        else:
            par_stride.insert(0, 0)

    pieces = []
    for tz in unfold_taps[0]:
        for ty in unfold_taps[1]:
            for tx in unfold_taps[2]:
                sl = [slice(None)]
                ch = 0
                for ax, t in zip(range(3), (tz, ty, tx)):
                    if t is None:
                        sl.append(slice(None))
                    else:
                        sl.append(slice(t // 2, t // 2 + outs[ax]))
                        ch += (t % 2) * par_stride[ax]
                sl.append(slice(ch, ch + c_in))
                pieces.append(x[tuple(sl)])
    x = jnp.concatenate(pieces, axis=-1)

    # --- residual conv over the stride-1 axes (or a pure matmul) ---
    res_k = tuple(ks[ax] if strides[ax] == 1 else 1 for ax in range(3))
    # kernel [kd,kh,kw,Cin,Cout] -> [res_kd,res_kh,res_kw, unfolded, Cout]:
    # move unfolded-axis taps in (dz,dy,dx) lex order in front of C_in,
    # matching the concat order above.
    perm_taps = [ax for ax in range(3) if strides[ax] == 2]
    perm_rest = [ax for ax in range(3) if strides[ax] == 1]
    kperm = kernel.transpose(*perm_rest, *perm_taps, 3, 4)
    unfolded = x.shape[-1]
    kres = kperm.reshape(
        *[ks[ax] for ax in perm_rest], unfolded, c_out
    ).reshape(*res_k, unfolded, c_out)

    if res_k == (1, 1, 1):
        y = jax.lax.dot_general(
            x.astype(dt).reshape(-1, unfolded),
            kres.astype(dt).reshape(unfolded, c_out),
            (((1,), (0,)), ((), ())),
        )
        return y.reshape(b, *outs, c_out).astype(dt)
    return jax.lax.conv_general_dilated(
        x.astype(dt), kres.astype(dt), window_strides=(1, 1, 1),
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(dt)


def _unfold_active(strides, kernel_shape, c_in) -> bool:
    """Opt-in only: the XLA tap-unfold compile-OOMs at production geometry
    (module docstring) — it exists for small-geometry A/Bs and tests.
    When set, it takes priority over the default-on im2col path so
    VSN_UNFOLD_STEM=1 alone selects the legacy form."""
    return (env_flag("VSN_UNFOLD_STEM") is True
            and should_unfold(strides, kernel_shape, c_in))


def _im2col_active(strides, kernel_shape, padding, c_in) -> bool:
    from vsn_tpu.ops.stem_im2col import should_im2col

    if not should_im2col(strides, kernel_shape, padding, c_in):
        return False
    v = env_flag("VSN_STEM_IM2COL")
    if v is not None:
        return v
    return jax.devices()[0].platform == "tpu"


def depthwise_conv3d_shift(x: jax.Array, kernel: jax.Array,
                           dtype=None) -> jax.Array:
    """Depthwise stride-1 conv as kernel-tap shift-multiply-accumulates.

    XLA's TPU lowering of a group-size-1 conv contracts K=1 on the MXU
    (1/128 of peak, same wall as the stems above). A depthwise conv is
    really an elementwise FMA per tap — a VPU job: pad once, then each
    tap is a static slice times a [C]-broadcast weight, which XLA fuses
    into a single bandwidth-bound elementwise pass.

    Args:
        x: [B, D, H, W, C].
        kernel: [kd, kh, kw, 1, C] (nn.Conv's DHWIO layout at
            feature_group_count=C), odd kernel, SAME padding implied.
    Returns: [B, D, H, W, C] in ``dtype`` (default x.dtype).

    Reference site this accelerates:
    /root/reference/models/medvit_utils.py:427-532 (LocalityFeedForward
    depthwise conv; likewise MHCA's grouped conv at group size 1).
    """
    dt = dtype or x.dtype
    kd, kh, kw, g, c = kernel.shape
    assert g == 1 and c == x.shape[-1], (kernel.shape, x.shape)
    d, h, w = x.shape[1:4]
    x = x.astype(dt)
    kernel = kernel.astype(dt)
    xp = jnp.pad(x, [(0, 0), (kd // 2,) * 2, (kh // 2,) * 2,
                     (kw // 2,) * 2, (0, 0)])
    out = jnp.zeros_like(x)
    for tz in range(kd):
        for ty in range(kh):
            for tx in range(kw):
                out = out + (
                    xp[:, tz:tz + d, ty:ty + h, tx:tx + w, :]
                    * kernel[tz, ty, tx, 0, :]
                )
    return out


class DepthwiseConv(nn.Module):
    """nn.Conv(feature_group_count=C, use_bias=False) drop-in (identical
    'kernel' param, DHWIO [k,k,k,1,C]).

    MEASURED 2026-08-19 (scripts/perf_probe_stem.py dw384, v5e, MedViT
    stage-0 LFF shape): XLA's grouped conv runs 5.3 ms fwd / 7.2 full vs
    the shift-multiply VPU form's 16.0 / 44.6 — the round-2 hypothesis
    that group-size-1 convs strand the MXU at K=1 is REFUTED at this
    shape (XLA's depthwise lowering is fine). Default is therefore the
    grouped conv everywhere; VSN_DW_SHIFT=1 keeps the shift form
    available for A/Bs."""

    kernel_size: Tuple[int, int, int]
    kernel_init: object = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (*self.kernel_size, 1, c),
            jnp.float32,
        )
        if env_flag("VSN_DW_SHIFT") is True:
            return depthwise_conv3d_shift(x, kernel, dtype=self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=[(k // 2, k // 2) for k in self.kernel_size],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        ).astype(self.dtype)


class UnfoldedConv(nn.Module):
    """nn.Conv(use_bias=False) drop-in whose TPU path runs the Pallas
    halo-im2col stem kernel (ops/stem_im2col.py; force with
    VSN_STEM_IM2COL=0/1). Declares the identical param ('kernel', DHWIO)
    so checkpoints and init behavior match nn.Conv exactly; falls back to
    lax conv otherwise. The legacy XLA tap-unfold form stays available
    via VSN_UNFOLD_STEM=1 ALONE for small-geometry A/Bs only (checked
    before the im2col gate; it compile-OOMs at production size — module
    docstring)."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    kernel_init: object = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, c_in, self.features), jnp.float32,
        )
        if _unfold_active(self.strides, self.kernel_size, c_in):
            return tap_unfolded_conv(
                x, kernel, self.strides, self.padding, dtype=self.dtype
            )
        if _im2col_active(self.strides, self.kernel_size, self.padding,
                          c_in):
            from vsn_tpu.ops.stem_im2col import stem_conv_im2col

            return stem_conv_im2col(
                x, kernel, self.strides, self.padding, dtype=self.dtype
            )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=[(p, p) for p in self.padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(self.dtype)
