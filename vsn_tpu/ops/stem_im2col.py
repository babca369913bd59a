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

This kernel builds it in VMEM only:

  * host side (XLA, forward-only — it sits under a custom_vjp, so the
    strided-slice backward that faults the TPU worker is never taken):
    zero-pad, then split each stride-2 axis into its 2 parity planes,
    giving ``P [B, nper, D', H', W']`` where every kernel tap becomes a
    CONTIGUOUS slice of one parity plane;
  * one Pallas program per (batch, output-z-plane): DMA the [nper, zin,
    H', W'] slab into VMEM, copy the ``taps`` slices into an im2col
    scratch ``[taps, Ho, Wo]``, transpose once in VMEM to ``[Ho, taps,
    Wo]``, and contract tap-rows against the ``[taps, C_out]`` weight
    matrix on the MXU (K = taps = 343 for the ResNet stem vs the 1 XLA
    manages);
  * backward: dW reuses the identical in-VMEM im2col (``[taps, Wo] x
    [Wo, C_out]`` per row, f32-accumulated into a revisited output block
    across the sequential TPU grid); dx is emitted through ``jax.vjp`` of
    the plain XLA conv — stems are the first layer, so dx is dead code
    XLA removes, and when a test does ask for it the reference formula is
    exactly right.

Reference stems this accelerates: /root/reference/models/resnet_3d.py:129-137
(conv1, 7^3 stride (1,2,2)) and /root/reference/models/medvit_3d.py:543-549
(stem conv 0, 3^3 stride 2).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsn_tpu.ops.window_attention import _on_tpu

# Stem programs keep the whole [taps<=343, Ho, Wo] im2col + its transpose
# in VMEM (~17 MB at ResNet geometry); v5e has 128 MB.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def should_im2col(strides: Sequence[int], kernel_shape: Sequence[int],
                  padding: Sequence[int], c_in: int) -> bool:
    """Supported + profitable: C_in=1 (the MXU-starved case), odd kernels
    with SAME-style padding, strides in {1, 2}, bounded tap count."""
    if c_in != 1:
        return False
    if any(s not in (1, 2) for s in strides):
        return False
    if any(k % 2 == 0 or p != k // 2 for k, p in zip(kernel_shape, padding)):
        return False
    taps = 1
    for k in kernel_shape:
        taps *= k
    return taps <= 512


def _geometry(shape, kernel_shape, strides, padding):
    """Static per-axis plan. Returns (pads, halves, outs, zin, taps_table).

    pads: (lo, hi) zero padding per spatial axis (hi grows by 1 on odd
      stride-2 extents so the parity split is exact).
    halves: parity-plane extent per axis (= padded, or padded//2 if
      strided).
    outs: conv output extent per axis.
    zin: z-extent of the per-program parity slab.
    taps_table: per tap (parity-plane index, z/y/x offsets into the
      plane) in (dz, dy, dx) C-order — the order ``kernel.reshape(taps,
      C_out)`` produces.
    """
    pads, halves, outs = [], [], []
    for ax in range(3):
        size, k, s, p = shape[ax], kernel_shape[ax], strides[ax], padding[ax]
        lo, hi = p, p
        if s == 2 and (size + lo + hi) % 2:
            hi += 1
        out = (size + 2 * p - k) // s + 1
        padded = size + lo + hi
        pads.append((lo, hi))
        halves.append(padded // 2 if s == 2 else padded)
        outs.append(out)
    kd = kernel_shape[0]
    zin = (kd + 1) // 2 if strides[0] == 2 else kd
    # parity index: strided axes in z,y,x order, earlier axis more
    # significant — matches the host-side split order in _parity_split.
    table = []
    for dz in range(kernel_shape[0]):
        for dy in range(kernel_shape[1]):
            for dx in range(kernel_shape[2]):
                par, offs = 0, []
                for ax, d in zip(range(3), (dz, dy, dx)):
                    if strides[ax] == 2:
                        par = par * 2 + d % 2
                        offs.append(d // 2)
                    else:
                        offs.append(d)
                table.append((par, *offs))
    # conv arithmetic must land every tap slice inside the parity planes
    assert outs[0] - 1 + zin <= halves[0], (outs, zin, halves)
    for ax in (1, 2):
        m = max(t[1 + ax] for t in table)
        assert m + outs[ax] <= halves[ax], (ax, m, outs, halves)
    return pads, halves, outs, zin, table


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
    """Pad + parity-split the [B, D, H, W, 1] input; returns (P, geometry)."""
    b = x.shape[0]
    shape = x.shape[1:4]
    pads, halves, outs, zin, table = _geometry(
        shape, kernel_shape, strides, padding
    )
    x_pad = jnp.pad(x[..., 0], [(0, 0), *pads])
    return _parity_split(x_pad, strides), (halves, outs, zin, table)


def _ref_conv(x, kernel, strides, padding, dt):
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), window_strides=tuple(strides),
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(dt)


def _fwd_pallas(p_arr, w2, geometry, dt):
    halves, outs, zin, table = geometry
    b, nper = p_arr.shape[:2]
    do, ho, wo = outs
    taps, co = w2.shape

    def kernel(p_hbm, w_ref, out_ref, pv, im_a, im_b, sem):
        bi = pl.program_id(0)
        zo = pl.program_id(1)
        cp = pltpu.make_async_copy(
            p_hbm.at[bi, :, pl.ds(zo, zin)], pv, sem
        )
        cp.start()
        cp.wait()
        for t, (par, z0, y0, x0) in enumerate(table):
            im_a[t] = pv[par, z0, y0:y0 + ho, x0:x0 + wo]
        # one VMEM relayout so tap-rows sit on sublanes for the MXU
        im_b[:] = jnp.swapaxes(im_a[:], 0, 1)

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
            pltpu.VMEM((nper, zin, halves[1], halves[2]), p_arr.dtype),
            pltpu.VMEM((taps, ho, wo), p_arr.dtype),
            pltpu.VMEM((ho, taps, wo), p_arr.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_CPARAMS,
        interpret=not _on_tpu(),
    )(p_arr, w2)


def _dw_pallas(p_arr, g, geometry):
    """dW[t, c] = sum over tokens of im2col[t, token] * dout[token, c],
    f32-accumulated into one revisited [taps, C_out] output block across
    the sequential TPU grid (the same pattern as
    ops/swin_block_kernels.py's parameter grads)."""
    halves, outs, zin, table = geometry
    b, nper = p_arr.shape[:2]
    do, ho, wo = outs
    taps = len(table)
    co = g.shape[-1]

    def kernel(p_hbm, g_ref, dw_ref, pv, im_a, im_b, acc, sem):
        bi = pl.program_id(0)
        zo = pl.program_id(1)
        cp = pltpu.make_async_copy(
            p_hbm.at[bi, :, pl.ds(zo, zin)], pv, sem
        )
        cp.start()
        cp.wait()
        for t, (par, z0, y0, x0) in enumerate(table):
            im_a[t] = pv[par, z0, y0:y0 + ho, x0:x0 + wo]
        im_b[:] = jnp.swapaxes(im_a[:], 0, 1)
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
            pltpu.VMEM((nper, zin, halves[1], halves[2]), p_arr.dtype),
            pltpu.VMEM((taps, ho, wo), p_arr.dtype),
            pltpu.VMEM((ho, taps, wo), p_arr.dtype),
            pltpu.VMEM((taps, co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_CPARAMS,
        interpret=not _on_tpu(),
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
    w2 = kernel.astype(dt).reshape(-1, c_out)
    y = _fwd_pallas(p_arr, w2, geometry, dt)
    return y, (x, kernel)


def _stem_conv_bwd(strides, padding, dt, res, g):
    x, kernel = res
    p_arr, geometry = _prep(x.astype(dt), kernel.shape[:3], strides, padding)
    dw2 = _dw_pallas(p_arr, g.astype(dt), geometry)
    dkernel = dw2.reshape(kernel.shape).astype(kernel.dtype)
    # dx through the reference XLA conv's VJP: exact, and dead code the
    # compiler removes in the stem position (x is the network input).
    _, vjp = jax.vjp(
        lambda xx: _ref_conv(xx, kernel, strides, padding, dt), x
    )
    dx = vjp(g.astype(dt))[0].astype(x.dtype)
    return dx, dkernel


_stem_conv.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def stem_conv_im2col(x: jax.Array, kernel: jax.Array,
                     strides: Sequence[int], padding: Sequence[int],
                     dtype=None) -> jax.Array:
    """Exact conv(x, kernel) for C_in=1 stems via the VMEM-only im2col
    kernel. Gate with :func:`should_im2col` first; falls back is the
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
