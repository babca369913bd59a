"""Halo-im2col Pallas kernel for tiny-C_in stem convolutions.

Why this exists: XLA's TPU conv contracts only C_in per kernel tap, so the
C_in=1 stems run the MXU at K=1 — 1/128 of peak (ResNet-18 7^3 stem:
154.5 ms forward for 306 GFLOP at micro 8, BASELINE.md). The first fix
attempt (``ops/conv_unfold.tap_unfolded_conv``) moved stride-2 taps into
channels with XLA slices+concat, but at production geometry XLA
materializes every tap slice in HBM with its 1-2-wide channel dim on the
128 lanes — 85-170x tile padding, 3.4 GB per slice, 100 GB total: compile
OOM (measured 2026-08-19, /tmp/q_arch.log). The im2col matrix must never
touch HBM.

This kernel builds it in VMEM only. Layout is everything — the v1 kernel
(git 534d94c) built [taps, Ho, Wo] with one small copy per tap plus a
leading<->sublane swapaxes, and measured copy-bound at 77 ms (2x over the
XLA conv, but ~2% MXU). v2 stores the parity planes **z-on-sublanes** so
the whole build is a handful of large static copies:

  * host side (XLA, forward-only — it sits under a custom_vjp, so the
    strided-slice backward that faults the TPU worker is never taken):
    zero-pad, split each stride-2 axis into its parity planes, and lay
    the result out as ``P [B, nper, H', D', W']`` — output-z slabs are
    then *sublane* ranges, and every kernel tap is a contiguous
    (lead, sublane, lane) box;
  * one Pallas program per (batch, output-z-plane): DMA the 16-aligned
    [nper, H', 24, W'] slab, rotate the z offset once in VMEM, then ONE
    3D copy per (dy, dx[, z-parity]) tap GROUP — 49 copies for the 7^3
    stem — fills the im2col scratch ``[Ho, taps, Wo]`` with tap rows on
    sublanes, exactly where the MXU wants its contraction;
  * per output row, one [taps, Wo] x [taps, C_out] MXU dot (K = 343 for
    the ResNet stem vs the 1 XLA manages);
  * backward: dW reuses the identical in-VMEM im2col ([taps, Wo] x
    [Wo, C_out] per row, f32-accumulated into a revisited output block
    across the sequential TPU grid); VSN_STEM_DW=xla switches dW to the
    plain XLA conv VJP (which contracts K = tokens and is itself fast —
    28 ms measured; pick whichever the probe says). dx always goes
    through ``jax.vjp`` of the plain XLA conv — stems are the first
    layer, so dx is dead code XLA removes, and when a test does ask for
    it the reference formula is exactly right.

Reference stems this accelerates: /root/reference/models/resnet_3d.py:129-137
(conv1, 7^3 stride (1,2,2)). MedViT's 3^3 stem0
(/root/reference/models/medvit_3d.py:543-549) measured FASTER as a plain
XLA conv (10.4 vs 23.1 ms — 27 taps don't amortize the im2col build), so
``should_im2col`` requires taps >= 64.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# late-bound module access so tests' _ForceTpu patch of wa._on_tpu
# reaches this module too (a from-import would freeze the binding)
import vsn_tpu.ops.window_attention as _wa

# The im2col scratch [Ho, taps<=343, Wo] is ~8 MB at ResNet geometry plus
# slab/rotate buffers; v5e has 128 MB VMEM.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

_SLAB = 16     # DMA z-extent: 8-aligned start + zoff<8 + zin<=8
_ALIGN = 8     # sublane alignment for the slab's DMA start


def should_im2col(strides: Sequence[int], kernel_shape: Sequence[int],
                  padding: Sequence[int], c_in: int) -> bool:
    """Supported + profitable: C_in=1 (the MXU-starved case), odd kernels
    with SAME-style padding, strides in {1, 2}, and enough taps to
    amortize the in-VMEM im2col build (3^3 = 27 taps measured slower than
    the plain conv; 7^3 = 343 measured faster)."""
    if c_in != 1:
        return False
    if any(s not in (1, 2) for s in strides):
        return False
    if any(k % 2 == 0 or p != k // 2 for k, p in zip(kernel_shape, padding)):
        return False
    taps = 1
    for k in kernel_shape:
        taps *= k
    zin = ((kernel_shape[0] + 1) // 2 if strides[0] == 2
           else kernel_shape[0])
    return 64 <= taps <= 512 and zin <= 8


def _geometry(shape, kernel_shape, strides, padding):
    """Static plan. Returns (pads, halves, outs, zin, blocks, perm).

    pads: (lo, hi) zero padding per spatial axis (hi grows by 1 on odd
      stride-2 extents so the parity split is exact).
    halves: parity-plane extent per axis (= padded, or padded//2 if
      strided).
    outs: conv output extent per axis.
    zin: z-extent (in parity planes) each output z-plane reads.
    blocks: per tap GROUP (par, y0, x0, row0, nrows) — group = one
      (dy, dx[, z-parity]) combination; its nrows z-taps are a contiguous
      sublane range of one parity plane AND a contiguous row range of the
      im2col scratch.
    perm: tap permutation such that kernel.reshape(taps, C)[perm] matches
      the scratch's row order (groups in (dy, dx, pz) order, z ascending
      within a group).
    """
    # Loud preconditions: should_im2col gates routed callers, but direct
    # calls (tests, probes) must not silently index past the 8-sublane
    # parity scratch or mis-split parities.
    assert all(s in (1, 2) for s in strides), strides
    assert all(k % 2 == 1 and p == k // 2
               for k, p in zip(kernel_shape, padding)), (
        f"odd kernel with SAME padding required, got {kernel_shape} "
        f"pad {padding}")
    _zin = ((kernel_shape[0] + 1) // 2 if strides[0] == 2
            else kernel_shape[0])
    assert _zin <= _ALIGN, (
        f"z-extent {_zin} exceeds the {_ALIGN}-sublane parity scratch "
        f"(kernel {kernel_shape}, strides {strides})")

    pads, halves, outs = [], [], []
    for ax in range(3):
        size, k, s, p = shape[ax], kernel_shape[ax], strides[ax], padding[ax]
        lo, hi = p, p
        if s == 2 and (size + lo + hi) % 2:
            hi += 1
        outs.append((size + 2 * p - k) // s + 1)
        padded = size + lo + hi
        pads.append((lo, hi))
        halves.append(padded // 2 if s == 2 else padded)
    kd, kh, kw = kernel_shape
    sz, sy, sx = strides
    zin = (kd + 1) // 2 if sz == 2 else kd

    # parity index: strided axes in z,y,x order, earlier axis more
    # significant — matches the host-side split order in _parity_split.
    def par_of(dz, dy, dx):
        par = 0
        for ax, d in zip(range(3), (dz, dy, dx)):
            if strides[ax] == 2:
                par = par * 2 + d % 2
        return par

    blocks, perm, row = [], [], 0
    for dy in range(kh):
        y0 = dy // 2 if sy == 2 else dy
        for dx in range(kw):
            x0 = dx // 2 if sx == 2 else dx
            for pz in range(2) if sz == 2 else (0,):
                dzs = [d for d in range(kd) if sz == 1 or d % 2 == pz]
                if not dzs:
                    continue
                blocks.append((par_of(dzs[0], dy, dx), y0, x0, row,
                               len(dzs)))
                for d in dzs:
                    perm.append(d * (kh * kw) + dy * kw + dx)
                row += len(dzs)
    assert row == kd * kh * kw
    assert outs[0] - 1 + zin <= halves[0], (outs, zin, halves)
    for ax in (1, 2):
        m = (kernel_shape[ax] - 1) // 2 if strides[ax] == 2 \
            else kernel_shape[ax] - 1
        assert m + outs[ax] <= halves[ax], (ax, m, outs, halves)
    return pads, halves, outs, zin, blocks, perm


def _parity_split(x_pad: jax.Array, strides) -> jax.Array:
    """[B, Dp, Hp, Wp] -> [B, nper, D', H', W'] stacking the stride-2
    parity planes (earlier strided axis more significant, matching
    _geometry's parity index)."""
    planes = [x_pad]
    for ax in range(3):
        if strides[ax] == 2:
            nxt = []
            for p in planes:
                sl0 = [slice(None)] * 4
                sl1 = [slice(None)] * 4
                sl0[1 + ax] = slice(0, None, 2)
                sl1[1 + ax] = slice(1, None, 2)
                nxt.extend([p[tuple(sl0)], p[tuple(sl1)]])
            planes = nxt
    return jnp.stack(planes, axis=1)


def _prep(x: jax.Array, kernel_shape, strides, padding):
    """Pad + parity-split + relayout the [B, D, H, W, 1] input.

    Returns (P [B, nper, H', D'', W''], geometry). z sits on SUBLANES
    (dim 3) so the kernel's output-z slab is a sublane range; D'' is
    padded so every 16-aligned [_SLAB]-extent slice stays in bounds, and
    W'' to the 128-lane tile, keeping the HBM slab DMA slices
    tile-aligned (Mosaic rejects unaligned sublane/lane slice extents).
    All pad zeros sit beyond every tap slice's reach."""
    shape = x.shape[1:4]
    pads, halves, outs, zin, blocks, perm = _geometry(
        shape, kernel_shape, strides, padding
    )
    x_pad = jnp.pad(x[..., 0], [(0, 0), *pads])
    p_arr = _parity_split(x_pad, strides)      # [B, nper, D', H', W']
    p_arr = p_arr.transpose(0, 1, 3, 2, 4)     # [B, nper, H', D', W']
    d_need = max(halves[0],
                 _ALIGN * ((outs[0] - 1) // _ALIGN) + _SLAB)
    w128 = -halves[2] % 128
    if d_need > halves[0] or w128:
        p_arr = jnp.pad(
            p_arr,
            [(0, 0), (0, 0), (0, 0), (0, d_need - halves[0]), (0, w128)],
        )
    dims = (halves[1], d_need, halves[2] + w128)  # (H', D'', W'')
    return p_arr, (dims, outs, zin, blocks, perm)


def _ref_conv(x, kernel, strides, padding, dt):
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), window_strides=tuple(strides),
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(dt)


def _build_im2col(p_hbm, w_or_none, pv, pva, im_b, sem, geometry):
    """Shared fwd/dw body: DMA the slab for (program b, zo), rotate the z
    offset once, then one 3D copy per tap group into im_b [Ho, taps, Wo].
    """
    (hq, dq, wq), outs, zin, blocks, _ = geometry
    do, ho, wo = outs
    bi = pl.program_id(0)
    zo = pl.program_id(1)
    z16 = pl.multiple_of((zo // _ALIGN) * _ALIGN, _ALIGN)
    cp = pltpu.make_async_copy(
        p_hbm.at[bi, :, :, pl.ds(z16, _SLAB), :], pv, sem
    )
    cp.start()
    cp.wait()
    # one z-offset realignment so tap groups read static z offsets.
    # pl.ds with a dynamic sublane start is rejected (Mosaic cannot prove
    # 8-alignment) and tpu.dynamic_rotate only does 32-bit data, so pick
    # the STATIC unaligned slice (supported) with an 8-way switch.
    v = pv[:]
    pva[:] = jax.lax.switch(
        zo - z16, [lambda i=i: v[:, :, i:i + 8, :] for i in range(_ALIGN)]
    )
    for par, y0, x0, row0, nr in blocks:
        im_b[:, row0:row0 + nr, :] = pva[par, y0:y0 + ho, 0:nr,
                                         x0:x0 + wo]


def _fwd_pallas(p_arr, w2, geometry, dt):
    dims, outs, zin, blocks, _ = geometry
    b, nper = p_arr.shape[:2]
    do, ho, wo = outs
    taps, co = w2.shape

    def kernel(p_hbm, w_ref, out_ref, pv, pva, im_b, sem):
        _build_im2col(p_hbm, w_ref, pv, pva, im_b, sem, geometry)

        def body(r, _):
            y = jax.lax.dot_general(
                im_b[r], w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, 0, pl.ds(r, 1)] = y.astype(out_ref.dtype)[None]
            return 0

        jax.lax.fori_loop(0, ho, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(b, do),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ho, wo, co), lambda bi, zo: (bi, zo, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, do, ho, wo, co), dt),
        scratch_shapes=[
            pltpu.VMEM((nper, dims[0], _SLAB, dims[2]), p_arr.dtype),
            pltpu.VMEM((nper, dims[0], 8, dims[2]), p_arr.dtype),
            pltpu.VMEM((ho, taps, wo), p_arr.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(p_arr, w2)


def _dw_pallas(p_arr, g, geometry, taps):
    """dW[t, c] = sum over tokens of im2col[t, token] * dout[token, c],
    f32-accumulated into one revisited [taps, C_out] output block across
    the sequential TPU grid (the same pattern as
    ops/swin_block_kernels.py's parameter grads)."""
    dims, outs, zin, blocks, _ = geometry
    b, nper = p_arr.shape[:2]
    do, ho, wo = outs
    co = g.shape[-1]

    def kernel(p_hbm, g_ref, dw_ref, pv, pva, im_b, acc, sem):
        _build_im2col(p_hbm, None, pv, pva, im_b, sem, geometry)
        acc[:] = jnp.zeros_like(acc)

        def body(r, _):
            gr = g_ref[0, 0, pl.ds(r, 1)][0]  # [Wo, Co]
            acc[:] = acc[:] + jax.lax.dot_general(
                im_b[r], gr, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, ho, body, 0)
        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            dw_ref[:] = acc[:]

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:] = dw_ref[:] + acc[:]

    return pl.pallas_call(
        kernel,
        grid=(b, do),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, ho, wo, co), lambda bi, zo: (bi, zo, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (taps, co), lambda bi, zo: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((taps, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nper, dims[0], _SLAB, dims[2]), p_arr.dtype),
            pltpu.VMEM((nper, dims[0], 8, dims[2]), p_arr.dtype),
            pltpu.VMEM((ho, taps, wo), p_arr.dtype),
            pltpu.VMEM((taps, co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(p_arr, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _stem_conv(x, kernel, strides, padding, dt):
    y, _ = _stem_conv_fwd(x, kernel, strides, padding, dt)
    return y


def _stem_conv_fwd(x, kernel, strides, padding, dt):
    c_out = kernel.shape[-1]
    p_arr, geometry = _prep(
        x.astype(dt), kernel.shape[:3], strides, padding
    )
    perm = geometry[-1]
    w2 = kernel.astype(dt).reshape(-1, c_out)[jnp.asarray(perm)]
    y = _fwd_pallas(p_arr, w2, geometry, dt)
    return y, (x, kernel)


def _stem_conv_bwd(strides, padding, dt, res, g):
    x, kernel = res
    taps = kernel.shape[0] * kernel.shape[1] * kernel.shape[2]
    # default xla: XLA's dW conv contracts K = tokens and measured 29.3 ms
    # vs the Pallas im2col dW's 52.9 (scripts/perf_probe_stem.py, v5e)
    if os.environ.get("VSN_STEM_DW", "xla") == "pallas":
        p_arr, geometry = _prep(
            x.astype(dt), kernel.shape[:3], strides, padding
        )
        perm = geometry[-1]
        dw2 = _dw_pallas(p_arr, g.astype(dt), geometry, taps)
        inv = jnp.zeros((taps,), jnp.int32).at[jnp.asarray(perm)].set(
            jnp.arange(taps, dtype=jnp.int32)
        )
        dkernel = dw2[inv].reshape(kernel.shape).astype(kernel.dtype)
    else:
        _, vjp_w = jax.vjp(
            lambda kk: _ref_conv(x, kk, strides, padding, dt), kernel
        )
        dkernel = vjp_w(g.astype(dt))[0].astype(kernel.dtype)
    # dx through the reference XLA conv's VJP: exact, and dead code the
    # compiler removes in the stem position (x is the network input).
    _, vjp_x = jax.vjp(
        lambda xx: _ref_conv(xx, kernel, strides, padding, dt), x
    )
    dx = vjp_x(g.astype(dt))[0].astype(x.dtype)
    return dx, dkernel


_stem_conv.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def stem_conv_im2col(x: jax.Array, kernel: jax.Array,
                     strides: Sequence[int], padding: Sequence[int],
                     dtype=None) -> jax.Array:
    """Exact conv(x, kernel) for C_in=1 stems via the VMEM-only im2col
    kernel. Gate with :func:`should_im2col` first; falling back is the
    caller's job (``ops/conv_unfold.UnfoldedConv``).

    Args:
        x: [B, D, H, W, 1].
        kernel: [kd, kh, kw, 1, C_out] (DHWIO, the nn.Conv layout).
        strides: per-axis stride, each 1 or 2.
        padding: per-axis symmetric padding, == k//2 (odd kernels).
        dtype: compute dtype (defaults to x.dtype).
    Returns: [B, outD, outH, outW, C_out] in ``dtype``.
    """
    dt = dtype or x.dtype
    assert x.shape[-1] == 1 and kernel.shape[3] == 1, (x.shape, kernel.shape)
    return _stem_conv(x, kernel, tuple(int(s) for s in strides),
                      tuple(int(p) for p in padding), dt)
