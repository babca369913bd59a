"""Pallas window-layout movers: spatial <-> window token layout + roll.

The window-resident residual stream (models/swin3d.BasicLayer3D) pays XLA
relayouts at stage boundaries and shifted junctions:
``window_partition`` (reshape+transpose), ``roll3d`` (wrap-pad+slice) and
``window_reverse``. A profiler trace of the full Swin-T fwd+bwd (micro 8,
2026-08-19) put ALL relayout-class ops at 32% of device time, and the
standalone partition measures 3.48 ms vs ~0.21 ms of raw HBM bandwidth
for the stage-1 tensor — XLA's transpose lowering runs far below the
layout-limited bound.

These two kernels move the data in one pass each, with the circular roll
folded into the addressing instead of a separate wrap-pad pass:

  ``spatial_to_windows(x, window, roll)``  == window_partition(roll3d(x, roll))
  ``windows_to_spatial(w, window, dims, roll)`` == roll3d(window_reverse(w), roll)

Addressing: with per-axis ``q, s = divmod(roll mod dim, w)``, an output
window ``g``'s locals split at the STATIC offset ``s`` into two pieces
whose source windows are ``(g - q - 1) mod gn`` and ``(g - q) mod gn`` —
static sizes, dynamic starts, i.e. exactly what a TPU DMA can do. Each
program handles one (batch, z-row, y-row) of windows: it DMAs the <=4
(z-piece x y-piece) full-W boxes, applies the x component of the roll as
one static sublane concat in VMEM, and copies [ww, C] tiles straight
into the output block (no intermediate spatial materialization).

The two transforms are exact inverses, so their VJPs are each other with
the roll negated — both backward passes run the same kernels.

Gating: ``relayout_active()`` (VSN_PALLAS_RELAYOUT=0/1 override; default
on-TPU). Used by BasicLayer3D's window-resident path; the jnp forms in
models/swin3d.py remain the fallback and the parity oracle.

Reference semantics being reproduced: window partition/reverse + the
torch.roll shifted-window mechanism,
/root/reference/models/swin_transformer_3d.py:72-103,202-382.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# late-bound module access so tests' _ForceTpu patch of wa._on_tpu reaches
# this module too (a from-import would freeze the original function)
import vsn_tpu.ops.window_attention as _wa
from vsn_tpu.utils.flags import env_flag

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def relayout_active() -> bool:
    v = env_flag("VSN_PALLAS_RELAYOUT")
    return _wa._on_tpu() if v is None else v


def glue_kernel_active() -> bool:
    """Gate for the fused windows->windows junction kernel in window_glue.

    Default ON on TPU: the round-4 STEP-LEVEL A/B (2026-08-19 queue4,
    /tmp/q4_glue_ab.log) measured 54.275 vol/s with the kernel vs 52.196
    without (+4.0%) on the full Swin-T 5c train step. The earlier isolated
    A/B (scripts/perf_probe_w2w, bit-parity) read as a wash — fwd won
    every junction type (stage1 4.64->4.23 / 5.12->4.31 ms, stage2
    4.98->3.03 / 3.11->2.89) but the stage2/shift adjoint regressed
    5.90->9.74 ms; inside the compiled step the fwd wins and XLA's
    scheduling of the adjoint recover the difference. VSN_PALLAS_GLUE=0
    restores the chain form (models/swin3d.window_glue, the parity
    oracle)."""
    v = env_flag("VSN_PALLAS_GLUE")
    return _wa._on_tpu() if v is None else v


def s2w_entry_active() -> bool:
    """Gate for the Pallas partition at stage ENTRY (unrolled,
    models/swin3d.BasicLayer3D).

    Default ON on TPU: the round-4 STEP-LEVEL A/B (2026-08-19 queue5,
    /tmp/q5_s2w_ab.log) measured 57.401 vol/s with the entry partition vs
    54.275 without (+5.8%) on the full Swin-T 5c train step — the roll=0
    entry junction was NOT layout-optimal under XLA after all; the
    Pallas one-pass partition (plus its one-pass adjoint) wins even
    unrolled. VSN_PALLAS_S2W=0 restores the reshape+transpose
    window_partition (the parity oracle)."""
    v = env_flag("VSN_PALLAS_S2W")
    return _wa._on_tpu() if v is None else v


def _axis_pieces(t: int, w: int, dim: int):
    """Static per-axis piece table for a roll of t (normalized mod dim).

    Returns [(dst_lo, length, src_window_delta, src_lo)]: output locals
    [dst_lo, dst_lo+length) of window g read source window
    (g + src_window_delta) mod gn at locals [src_lo, src_lo+length).
    """
    t = t % dim
    q, s = divmod(t, w)
    if s == 0:
        return [(0, w, -q, 0)]
    return [(0, s, -q - 1, w - s), (s, w - s, -q, 0)]


def _norm_roll(roll, dims):
    return tuple(int(r) % int(d) for r, d in zip(roll, dims))


def _batch_block(b: int, bytes_per_sample: int) -> int:
    """Largest divisor of b whose double-buffered per-program footprint
    stays under ~24 MB of VMEM."""
    budget = 24 * 1024 * 1024
    bb = max(1, min(b, budget // max(1, 2 * bytes_per_sample)))
    while b % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def spatial_to_windows(x: jax.Array, window: Tuple[int, int, int],
                       roll: Tuple[int, int, int] = (0, 0, 0)) -> jax.Array:
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] of roll3d(x, roll)."""
    return _s2w_impl(x, window, roll)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def windows_to_spatial(wins: jax.Array, window: Tuple[int, int, int],
                       dims: Tuple[int, int, int],
                       roll: Tuple[int, int, int] = (0, 0, 0)) -> jax.Array:
    """[B*nW, wd*wh*ww, C] -> roll3d([B, D, H, W, C], roll)."""
    return _w2s_impl(wins, window, dims, roll)


def _s2w_fwd(x, window, roll):
    return _s2w_impl(x, window, roll), x.shape


def _s2w_bwd(window, roll, x_shape, g):
    dims = x_shape[1:4]
    inv = tuple(-r for r in roll)
    return (_w2s_impl(g, window, dims, inv),)


def _w2s_fwd(wins, window, dims, roll):
    return _w2s_impl(wins, window, dims, roll), None


def _w2s_bwd(window, dims, roll, _, g):
    inv = tuple(-r for r in roll)
    return (_s2w_impl(g, window, inv),)


spatial_to_windows.defvjp(_s2w_fwd, _s2w_bwd)
windows_to_spatial.defvjp(_w2s_fwd, _w2s_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def windows_to_windows(wins: jax.Array, window: Tuple[int, int, int],
                       dims: Tuple[int, int, int],
                       roll: Tuple[int, int, int]) -> jax.Array:
    """[B*nW, N, C] -> [B*nW, N, C] junction glue in ONE pass:
    ``window_partition(roll3d(window_reverse(wins), roll))``, i.e.
    ``window_glue(wins, window, dims, -roll)`` (models/swin3d.py) without
    materializing the spatial intermediate. Pure permutation; the adjoint
    is the same kernel with the roll negated."""
    return _w2w_impl(wins, window, dims, roll)


def _w2w_fwd(wins, window, dims, roll):
    return _w2w_impl(wins, window, dims, roll), None


def _w2w_bwd(window, dims, roll, _, g):
    inv = tuple(-r for r in roll)
    return (_w2w_impl(g, window, dims, inv),)


windows_to_windows.defvjp(_w2w_fwd, _w2w_bwd)


def _s2w_impl(x, window, roll):
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    roll = _norm_roll(roll, (d, h, w))
    gn = (d // wd, h // wh, w // ww)
    assert gn[0] * wd == d and gn[1] * wh == h and gn[2] * ww == w, (
        x.shape, window)
    if not relayout_active():
        from vsn_tpu.models.swin3d import roll3d, window_partition

        return window_partition(roll3d(x, roll), window)

    zp = _axis_pieces(roll[0], wd, d)
    yp = _axis_pieces(roll[1], wh, h)
    xp = _axis_pieces(roll[2], ww, w)
    gzn, gyn, gxn = gn
    n = wd * wh * ww
    pieces = [(z, y) for z in zp for y in yp]
    bb = _batch_block(b, (len(pieces) + 1) * wd * wh * w * c
                      * x.dtype.itemsize)

    # One BlockSpec'd input per (z, y) piece — the SAME array passed
    # len(pieces) times, each spec fetching the full source window-row
    # [bb, wd, wh, W, C] at a dynamically-computed grid position (manual
    # DMA would need tile-aligned slice extents, which (W, C) aren't;
    # block fetches are also auto double-buffered across the grid).
    # Batching bb samples per program amortizes the per-program overhead
    # that dominated the unbatched form (15 us/program for ~1 us of tile
    # copies, scripts/perf_probe_relayout.py).
    def mk_spec(zdw, ydw):
        def imap(bi, gz, gy):
            mz = jax.lax.rem(gz + zdw + gzn, gzn)
            my = jax.lax.rem(gy + ydw + gyn, gyn)
            return (bi, mz, my, 0, 0)

        return pl.BlockSpec((bb, wd, wh, w, c), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [mk_spec(z[2], y[2]) for z, y in pieces]

    def kernel(*refs):
        fetches = refs[:len(pieces)]
        out_ref = refs[len(pieces)]
        for fetch, ((zlo, zn_, _, zsrc), (ylo, yn_, _, ysrc)) in zip(
                fetches, pieces):
            for ld in range(zn_):
                for lh in range(yn_):
                    r0 = ((zlo + ld) * wh + (ylo + lh)) * ww
                    for gx in range(gxn):
                        for dst_lo, ln_, dxw, src_lo in xp:
                            gxs = (gx + dxw) % gxn
                            x0 = gxs * ww + src_lo
                            out_ref[:, gx, r0 + dst_lo:r0 + dst_lo + ln_,
                                    :] = fetch[:, zsrc + ld, ysrc + lh,
                                               x0:x0 + ln_, :]

    out = pl.pallas_call(
        kernel,
        grid=(b // bb, gzn, gyn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, gxn, n, c),
            lambda bi, gz, gy: (bi, gz * gyn + gy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, gzn * gyn * gxn, n, c), x.dtype),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(*([x] * len(pieces)))
    # leading-dim merge: layout-free reshape to the [B*nW, N, C] contract
    return out.reshape(b * gzn * gyn * gxn, n, c)


def _w2w_impl(wins, window, dims, roll):
    """Fused junction: source and destination both in window layout.

    Same piece table as _s2w (rolled window-layout output), but the source
    spatial window-row is fetched from the WINDOW layout (a window's grid
    index is unchanged by reverse, so the (z, y) piece deltas pick the run
    row and the x pieces pick the window within the run — as in _w2s)."""
    d, h, w = (int(v) for v in dims)
    wd, wh, ww = window
    c = wins.shape[-1]
    roll = _norm_roll(roll, (d, h, w))
    gzn, gyn, gxn = d // wd, h // wh, w // ww
    n = wd * wh * ww
    b = wins.shape[0] // (gzn * gyn * gxn)
    if not relayout_active():
        from vsn_tpu.models.swin3d import (
            roll3d,
            window_partition,
            window_reverse,
        )

        return window_partition(
            roll3d(window_reverse(wins, window, dims), roll), window)

    zp = _axis_pieces(roll[0], wd, d)
    yp = _axis_pieces(roll[1], wh, h)
    xp = _axis_pieces(roll[2], ww, w)
    pieces = [(z, y) for z in zp for y in yp]
    bb = _batch_block(b, (len(pieces) + 1) * gxn * n * c
                      * wins.dtype.itemsize)
    wins4 = wins.reshape(b, gzn * gyn * gxn, n, c)  # leading split: free

    def mk_spec(zdw, ydw):
        def imap(bi, gz, gy):
            mz = jax.lax.rem(gz + zdw + gzn, gzn)
            my = jax.lax.rem(gy + ydw + gyn, gyn)
            return (bi, mz * gyn + my, 0, 0)

        return pl.BlockSpec((bb, gxn, n, c), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [mk_spec(z[2], y[2]) for z, y in pieces]

    def kernel(*refs):
        fetches = refs[:len(pieces)]
        out_ref = refs[len(pieces)]
        for run, ((zlo, zn_, _, zsrc), (ylo, yn_, _, ysrc)) in zip(
                fetches, pieces):
            for ld in range(zn_):
                for lh in range(yn_):
                    r0d = ((zlo + ld) * wh + (ylo + lh)) * ww
                    r0s = ((zsrc + ld) * wh + (ysrc + lh)) * ww
                    for gx in range(gxn):
                        for dst_lo, ln_, dxw, src_lo in xp:
                            gxs = (gx + dxw) % gxn
                            out_ref[:, gx, r0d + dst_lo:
                                    r0d + dst_lo + ln_, :] = (
                                run[:, gxs, r0s + src_lo:
                                    r0s + src_lo + ln_, :]
                            )

    out = pl.pallas_call(
        kernel,
        grid=(b // bb, gzn, gyn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, gxn, n, c),
            lambda bi, gz, gy: (bi, gz * gyn + gy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, gzn * gyn * gxn, n, c),
                                       wins.dtype),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(*([wins4] * len(pieces)))
    return out.reshape(b * gzn * gyn * gxn, n, c)


def _w2s_impl(wins, window, dims, roll):
    d, h, w = (int(v) for v in dims)
    wd, wh, ww = window
    c = wins.shape[-1]
    roll = _norm_roll(roll, (d, h, w))
    gzn, gyn, gxn = d // wd, h // wh, w // ww
    n = wd * wh * ww
    b = wins.shape[0] // (gzn * gyn * gxn)
    if not relayout_active():
        from vsn_tpu.models.swin3d import roll3d, window_reverse

        return roll3d(window_reverse(wins, window, dims), roll)

    zp = _axis_pieces(roll[0], wd, d)
    yp = _axis_pieces(roll[1], wh, h)
    xp = _axis_pieces(roll[2], ww, w)
    pieces = [(z, y) for z in zp for y in yp]
    bb = _batch_block(b, (len(pieces) + 1) * gxn * n * c
                      * wins.dtype.itemsize)
    wins4 = wins.reshape(b, gzn * gyn * gxn, n, c)  # leading split: free

    # one BlockSpec'd fetch per (z, y) piece: the full gx RUN of the
    # dynamically-selected source window row, [bb, gxn, N, C]
    def mk_spec(zdw, ydw):
        def imap(bi, gz, gy):
            mz = jax.lax.rem(gz + zdw + gzn, gzn)
            my = jax.lax.rem(gy + ydw + gyn, gyn)
            return (bi, mz * gyn + my, 0, 0)

        return pl.BlockSpec((bb, gxn, n, c), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [mk_spec(z[2], y[2]) for z, y in pieces]

    def kernel(*refs):
        fetches = refs[:len(pieces)]
        out_ref = refs[len(pieces)]
        # z/y pieces picked the source window ROW; the x pieces pick the
        # source window WITHIN the run — every write is a static
        # [bb, <=ww, C] tile copy
        for run, ((zlo, zn_, _, zsrc), (ylo, yn_, _, ysrc)) in zip(
                fetches, pieces):
            for ld in range(zn_):
                for lh in range(yn_):
                    for gx in range(gxn):
                        for dst_lo, ln_, dxw, src_lo in xp:
                            gxs = (gx + dxw) % gxn
                            r0 = ((zsrc + ld) * wh
                                  + (ysrc + lh)) * ww + src_lo
                            out_ref[:, zlo + ld, ylo + lh,
                                    gx * ww + dst_lo:
                                    gx * ww + dst_lo + ln_, :] = (
                                run[:, gxs, r0:r0 + ln_, :]
                            )

    return pl.pallas_call(
        kernel,
        grid=(b // bb, gzn, gyn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, wd, wh, w, c),
            lambda bi, gz, gy: (bi, gz, gy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), wins.dtype),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(*([wins4] * len(pieces)))
