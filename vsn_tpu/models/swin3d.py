"""3D Swin Transformer V1 (hierarchical shifted-window attention).

Capability parity with reference models/swin_transformer_3d.py: Conv3d patch
embed (+optional norm), 4 stages of window MSA with 3D relative-position bias
and alternating shifted windows, 8-way PatchMerging, pre-/post-norm variants,
ShakeDrop-or-DropPath, LayerScale, DeepScaleLM stable residuals, grad
checkpointing, T/S/B/L presets (swin_transformer_3d.py:20-49, 701-785).

TPU-first design:
  * channels-last [B, D, H, W, C] end to end — XLA's native conv/matmul
    layout, no permutes on the hot path;
  * every shape is static under jit: padding to window multiples and the
    shifted-window attention mask are computed ONCE at trace time with numpy
    (the reference rebuilds the mask on device every forward,
    swin_transformer_3d.py:463-492 — a free win);
  * the mask uses a region-id formulation (region index per axis in
    {inside, rolled-window, rolled-shift} -> same-id voxels attend) instead
    of the slice-loop construction, with a golden-value test against the
    reference algorithm;
  * window partition/reverse are reshape+transpose only — they fuse away;
  * with use_pallas on TPU, whole block halves run as fused Pallas kernels
    (vsn_tpu/ops/swin_block_kernels.py: LN+qkv+attention+proj+residual and
    LN+MLP+residual, custom VJPs, in-band LayerScale/post-norm) and
    divisible stages keep a window-resident residual stream (partition
    once, window_glue per shifted junction, reverse once — BasicLayer3D);
    non-divisible stages bin-pack real tokens into full virtual windows
    (packed layout). Otherwise attention is einsum-based with f32 softmax
    (the standalone vsn_tpu/ops/window_attention.py kernel covers the
    dropout/post-norm-ViT corners the block kernels exclude).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
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

# Preset table mirroring reference swin_transformer_3d.py:20-49 (_SWIN_CONFIGS).
SWIN_CONFIGS = {
    "T": dict(patch_size=[4, 4, 4], embed_dim=96, depths=[2, 2, 6, 2],
              num_heads=[3, 6, 12, 24], window_size=[7, 7, 7]),
    "S": dict(patch_size=[4, 4, 4], embed_dim=96, depths=[2, 2, 18, 2],
              num_heads=[3, 6, 12, 24], window_size=[7, 7, 7]),
    "B": dict(patch_size=[4, 4, 4], embed_dim=128, depths=[2, 2, 18, 2],
              num_heads=[4, 8, 16, 32], window_size=[7, 7, 7]),
    "L": dict(patch_size=[4, 4, 4], embed_dim=192, depths=[2, 2, 18, 2],
              num_heads=[6, 12, 24, 48], window_size=[7, 7, 7]),
}


# ---------------------------------------------------------------------------
# Static geometry helpers (trace-time numpy)
# ---------------------------------------------------------------------------

def clamp_window(x_size, window_size, shift_size):
    """Shrink window to the axis size and zero its shift where the input is
    not larger than the window (reference get_window_size_and_shift:92-103)."""
    w, s = list(window_size), list(shift_size)
    for i in range(3):
        if x_size[i] <= window_size[i]:
            w[i] = x_size[i]
            s[i] = 0
    return tuple(w), tuple(s)


def roll3d(x: jax.Array, shift: Tuple[int, int, int]) -> jax.Array:
    """3-axis roll over the spatial dims as wrap-pad + one static slice.

    jnp.roll lowers to one concat pass PER axis; the pad+slice form fuses
    into the adjacent partition/reverse transpose copy (measured at stage-1
    shapes: roll+partition 5.76 ms vs 4.82 for padpart, with partition
    alone at 4.17 — scripts/perf_probe_roll.py)."""
    sz, sy, sx = (int(-sv) % dim for sv, dim in zip(shift, x.shape[1:4]))
    if not (sz or sy or sx):
        return x
    y = jnp.pad(x, ((0, 0), (0, sz), (0, sy), (0, sx), (0, 0)), mode="wrap")
    return y[:, sz:sz + x.shape[1], sy:sy + x.shape[2], sx:sx + x.shape[3], :]


def window_partition(x: jax.Array, window: Tuple[int, int, int]) -> jax.Array:
    """[B, D, H, W, C] -> [B*nW, wD*wH*wW, C] (pure reshape/transpose)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(
    windows: jax.Array, window: Tuple[int, int, int], dims: Tuple[int, int, int]
) -> jax.Array:
    d, h, w = dims
    wd, wh, ww = window
    c = windows.shape[-1]
    b = windows.shape[0] // (d // wd * (h // wh) * (w // ww))
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


def window_glue(wins: jax.Array, window: Tuple[int, int, int],
                dims: Tuple[int, int, int],
                tshift: Tuple[int, int, int]) -> jax.Array:
    """Window layout A -> window layout rolled by ``-tshift``, in one pass.

    Equivalent to ``window_partition(roll3d(window_reverse(wins), -t))`` but
    expressed directly on the 8D window view: per axis (window w, shift
    0 <= s < w), output local index i reads input local (i+s) % w from grid
    cell g + (i+s)//w (cyclic), so the whole permutation is a grid-dim roll
    (outer-axis concat, large contiguous chunks) plus corner slices
    concatenated along the window-LOCAL dims — one fusable slice/concat
    tree with no intermediate spatial materialization. Used by the
    window-resident residual stream (BasicLayer3D): consecutive fused
    blocks hand windows straight to each other, replacing the
    reverse -> unroll / roll -> partition round trip (two relayout passes
    split by the opaque MLP kernel) with this single permutation.

    Default formulation is the 3-op composition: with the ops ADJACENT in
    the graph (no opaque kernel between them) XLA fuses them, strictly
    cheaper than the old arrangement. VSN_GLUE=corner switches to the
    corner-slice tree (scripts/perf_probe_glue.py A/Bs both on hardware);
    VSN_PALLAS_GLUE=1 dispatches to the one-pass Pallas windows->windows
    kernel (ops/window_relayout.windows_to_windows)."""
    from vsn_tpu.ops.window_relayout import (
        glue_kernel_active,
        windows_to_windows,
    )

    if glue_kernel_active() and any(t % d for t, d in zip(tshift, dims)):
        return windows_to_windows(
            wins, window, dims, tuple(-t for t in tshift))
    if os.environ.get("VSN_GLUE", "chain") == "chain":
        x = window_reverse(wins, window, dims)
        x = roll3d(x, tuple(-t for t in tshift))
        return window_partition(x, window)
    grids = tuple(dims[i] // window[i] for i in range(3))
    wd, wh, ww = window
    c = wins.shape[-1]
    b = wins.shape[0] // int(np.prod(grids))
    x = wins.reshape(b, *grids, wd, wh, ww, c)
    for ax in range(3):
        # Decompose the full-dim roll into whole-window grid-cell roll g
        # plus an in-window part s (a shifted->unshifted junction has
        # t = dim - s, i.e. g = grid - 1 wrapped cells + local w - s).
        g, s = divmod(tshift[ax] % dims[ax], window[ax])
        grid_ax, loc_ax = 1 + ax, 4 + ax
        if g:
            x = jnp.concatenate(
                (jax.lax.slice_in_dim(x, g, x.shape[grid_ax], axis=grid_ax),
                 jax.lax.slice_in_dim(x, 0, g, axis=grid_ax)), axis=grid_ax)
        if s == 0:
            continue
        up = jnp.concatenate(
            (jax.lax.slice_in_dim(x, 1, x.shape[grid_ax], axis=grid_ax),
             jax.lax.slice_in_dim(x, 0, 1, axis=grid_ax)), axis=grid_ax)
        lo = jax.lax.slice_in_dim(x, s, window[ax], axis=loc_ax)
        hi = jax.lax.slice_in_dim(up, 0, s, axis=loc_ax)
        x = jnp.concatenate((lo, hi), axis=loc_ax)
    return x.reshape(-1, wd * wh * ww, c)


def _axis_delta_onehot(w: int) -> np.ndarray:
    """[w, w, 2w-1] one-hot banded tensor: B[a, d, p] = 1 iff a - d + w - 1
    == p — the per-axis factor of the relative-position index."""
    a = np.arange(w)
    p = a[:, None] - a[None, :] + w - 1  # [w, w]
    out = np.zeros((w, w, 2 * w - 1), np.float32)
    out[a[:, None], a[None, :], p] = 1.0
    return out


def expand_bias_table(table: jax.Array, window: Tuple[int, int, int],
                      dtype=jnp.float32) -> jax.Array:
    """Relative-position bias [H, N, N] from the [(2wd-1)(2wh-1)(2ww-1), H]
    table via three banded one-hot contractions.

    Mathematically identical to ``table[relative_position_index(window)]``
    (tested), but expressed as small matmuls so the BACKWARD is matmuls
    too: the gather's VJP is a 63504-row scatter-add into the 1573-entry
    table, which costs ~0.44 ms/block on TPU (~4.7 ms/step across Swin-T's
    12 blocks, measured); the banded-contraction VJP is ~free. Reference
    semantics: swin_transformer_3d.py:162-199 bias lookup.
    """
    wd, wh, ww = window
    h = table.shape[-1]
    t = table.reshape(2 * wd - 1, 2 * wh - 1, 2 * ww - 1, h).astype(dtype)
    bz = jnp.asarray(_axis_delta_onehot(wd), dtype)
    by = jnp.asarray(_axis_delta_onehot(wh), dtype)
    bx = jnp.asarray(_axis_delta_onehot(ww), dtype)
    bias = jnp.einsum("adp,beq,cfr,pqrh->habcdef", bz, by, bx, t,
                      preferred_element_type=jnp.float32)
    n = wd * wh * ww
    return bias.reshape(h, n, n)


def relative_position_index(window: Tuple[int, int, int]) -> np.ndarray:
    """Static [N, N] lookup into the (2wd-1)(2wh-1)(2ww-1) bias table."""
    wd, wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


def shifted_window_region_ids(
    dims: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
    pad_to: int | None = None,
) -> np.ndarray:
    """Per-window voxel region ids [nW, N] built at trace time. Voxels get a
    region id per axis (0: untouched, 1: wrapped window tail, 2: wrapped
    shift tail); only same-id pairs may attend. With ``pad_to``, token
    positions beyond N are padded with -1 (they mask against every real id —
    consumed by the Pallas kernel)."""

    rd = _axis_region_labels(dims[0], window[0], shift[0])
    rh = _axis_region_labels(dims[1], window[1], shift[1])
    rw = _axis_region_labels(dims[2], window[2], shift[2])
    region = (
        rd[:, None, None] * 9 + rh[None, :, None] * 3 + rw[None, None, :]
    )  # [D, H, W]

    wd, wh, ww = window
    d, h, w = dims
    region = region.reshape(d // wd, wd, h // wh, wh, w // ww, ww)
    region = region.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    region = region.astype(np.int32)
    if pad_to is not None and pad_to > region.shape[1]:
        region = np.pad(
            region, [(0, 0), (0, pad_to - region.shape[1])],
            constant_values=-1,
        )
    return region


def shifted_window_mask(
    dims: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> np.ndarray:
    """Additive attention mask [nW, N, N] derived from the region ids —
    equivalent to the reference's cnt-slices construction
    (swin_transformer_3d.py:463-492)."""
    region = shifted_window_region_ids(dims, window, shift)
    diff = region[:, :, None] != region[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Packed ("compressed") window layout for window-padded stages
# ---------------------------------------------------------------------------
#
# When the token grid does not divide by the window (Swin-T stage 3:
# grid (9,11,9) vs window (6,7,6)), the reference pads to window multiples
# and runs attention/MLP on every padded token — 2016 tokens where 891 are
# real, 2.26x wasted FLOPs on the stage (swin_transformer_3d.py:457-461).
# The packed layout instead bin-packs the REAL tokens of all true windows
# into ceil(real/N) full-size "virtual windows" and masks cross-window
# attention with the composite region ids the kernels already support.
# Pack/unpack (and, for shifted blocks, the roll) are folded into one
# static 0/1 permutation matrix applied as a matmul — arbitrary gathers
# are prohibitively slow on TPU, one-hot matmuls ride the MXU.
#
# Numeric note (documented deviation): the reference lets boundary windows
# attend to zero-padding tokens (no mask for unshifted blocks, pad bands
# share region ids with real tokens in shifted ones). Here pad tokens are
# masked out of attention entirely — in BOTH the packed-fused and the
# padded-unfused paths, which therefore agree with each other but differ
# microscopically from the reference at window-boundary tokens of padded
# stages.


def _axis_region_labels(size: int, win: int, sh: int) -> np.ndarray:
    """Per-axis region label in rolled space: 0 untouched, 1 wrapped window
    tail, 2 wrapped shift tail (same rule as shifted_window_region_ids)."""
    r = np.zeros(size, np.int64)
    if sh > 0:
        r[size - win: size - sh] = 1
        r[size - sh:] = 2
    return r


def _rolled_grid(dims, window, shift):
    """Trace-time geometry of the rolled, window-padded grid.

    Returns (real [Dp,Hp,Wp] bool, flat_src, region, win_id, winpos), where
    position p of the rolled padded grid holds source voxel
    ((p + shift) mod padded) — real iff that source coord is inside
    ``dims`` — with its flat real-grid index, composite shift-region id,
    true-window index and lexicographic in-window position.
    """
    d, h, w = dims
    wd, wh, ww = window
    dp, hp, wp = (-(-s // ws) * ws for s, ws in zip(dims, window))
    pz, py, px = np.arange(dp), np.arange(hp), np.arange(wp)
    zc, yc, xc = (pz + shift[0]) % dp, (py + shift[1]) % hp, (px + shift[2]) % wp
    real = (
        (zc < d)[:, None, None]
        & (yc < h)[None, :, None]
        & (xc < w)[None, None, :]
    )
    flat_src = (
        zc[:, None, None] * (h * w) + yc[None, :, None] * w + xc[None, None, :]
    )
    region = (
        _axis_region_labels(dp, wd, shift[0])[pz][:, None, None] * 9
        + _axis_region_labels(hp, wh, shift[1])[py][None, :, None] * 3
        + _axis_region_labels(wp, ww, shift[2])[px][None, None, :]
    )
    nwy, nwx = hp // wh, wp // ww
    win_id = (
        (pz // wd)[:, None, None] * (nwy * nwx)
        + (py // wh)[None, :, None] * nwx
        + (px // ww)[None, None, :]
    )
    winpos = (
        (pz % wd)[:, None, None] * (wh * ww)
        + (py % wh)[None, :, None] * ww
        + (px % ww)[None, None, :]
    )
    return real, flat_src, region, win_id, winpos


class PackedWindowLayout(NamedTuple):
    perm: np.ndarray    # [V, N] int32 — flat real-token index per slot, -1 pad
    winpos: np.ndarray  # [V, N] int32 — lex in-window position per slot, -1 pad
    ids: np.ndarray     # [V, N] int32 — win_id * 27 + region per slot, -1 pad


@functools.lru_cache(maxsize=None)
def packed_window_layout(
    dims: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> PackedWindowLayout:
    """Bin-pack the real tokens of every true window into full-size virtual
    windows (first-fit decreasing; each true window stays whole inside one
    virtual window so masked window attention covers exactly its pairs)."""
    n = window[0] * window[1] * window[2]
    real, flat_src, region, win_id, winpos = _rolled_grid(dims, window, shift)

    r = real.ravel()
    order = np.lexsort((winpos.ravel()[r], win_id.ravel()[r]))
    src = flat_src.ravel()[r][order]
    reg = region.ravel()[r][order]
    wid = win_id.ravel()[r][order]
    pos = winpos.ravel()[r][order]

    uniq, starts, counts = np.unique(wid, return_index=True, return_counts=True)
    bins: list[list[int]] = []   # window indices (into uniq) per bin
    room: list[int] = []
    for k in np.argsort(-counts, kind="stable"):
        size = int(counts[k])
        for b, space in enumerate(room):
            if space >= size:
                bins[b].append(k)
                room[b] -= size
                break
        else:
            bins.append([k])
            room.append(n - size)

    v = len(bins)
    perm = np.full((v, n), -1, np.int32)
    wpos = np.full((v, n), -1, np.int32)
    ids = np.full((v, n), -1, np.int32)
    for b, ks in enumerate(bins):
        at = 0
        for k in ks:
            s, cnt = int(starts[k]), int(counts[k])
            sl = slice(at, at + cnt)
            perm[b, sl] = src[s:s + cnt]
            wpos[b, sl] = pos[s:s + cnt]
            ids[b, sl] = int(uniq[k]) * 27 + reg[s:s + cnt]
            at += cnt
    return PackedWindowLayout(perm, wpos, ids)


@functools.lru_cache(maxsize=None)
def packed_window_onehots(dims, window, shift):
    """(P [V, N, L], S [V, N, N]) float32 0/1 selection matrices: P maps the
    flat real-token stream into packed slots (pack = einsum('vnl,blc->vbnc'),
    unpack = its transpose — exact inverses since slots are disjoint); S maps
    full-window positions onto packed slots (per-chunk rel-pos bias =
    S_v @ bias @ S_v^T)."""
    lay = packed_window_layout(dims, window, shift)
    v, n = lay.perm.shape
    l = dims[0] * dims[1] * dims[2]
    p = np.zeros((v, n, l), np.float32)
    s = np.zeros((v, n, n), np.float32)
    vi, ni = np.nonzero(lay.perm >= 0)
    p[vi, ni, lay.perm[vi, ni]] = 1.0
    s[vi, ni, lay.winpos[vi, ni]] = 1.0
    return p, s


@functools.lru_cache(maxsize=None)
def packing_profitable(dims, window) -> bool:
    """Packed layout pays off when the padded grid computes >=1.3x the
    packed token count (virtual windows are full-size N)."""
    if all(dim % ws == 0 for dim, ws in zip(dims, window)):
        return False
    n = window[0] * window[1] * window[2]
    padded = 1
    for dim, ws in zip(dims, window):
        padded *= -(-dim // ws) * ws
    v = packed_window_layout(tuple(dims), tuple(window), (0, 0, 0)).perm.shape[0]
    return padded >= 1.3 * v * n


def padded_window_region_ids(
    dims: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> np.ndarray:
    """[nW, N] region ids on the window-PADDED grid with -1 at slots whose
    source voxel is padding (``dims`` are the real token dims). Used by the
    padded (unfused) path so pad tokens are masked out of attention — see
    the deviation note above."""
    real, _, region, _, _ = _rolled_grid(dims, window, shift)
    grid = np.where(real, region, -1)
    wd, wh, ww = window
    dp, hp, wp = grid.shape
    grid = grid.reshape(dp // wd, wd, hp // wh, wh, wp // ww, ww)
    grid = grid.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    return grid.astype(np.int32)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

def _apply_layernorm(x, scale, bias, dtype):
    """Plain LayerNorm (epsilon 1e-5) on raw scale/bias params — XLA
    fallback for the fused path's declared params."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    xc = x32 - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return y.astype(dtype)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias) without applying —
    used by the fused-kernel path so its param tree is bit-identical to the
    unfused module tree (checkpoints interoperate)."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: object = None

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features),
            jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                jnp.float32,
            )
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        return kernel, bias


class _ResDecor(nn.Module):
    """Residual decorations under the ResidualBranch submodule name: an
    optional rng draw (same fold path as the unfused module's make_rng) and
    an optional LayerScale gamma declared as the identical
    ``res*/LayerScale_0/gamma`` param tree. Returns (rng|None, gamma|None)."""

    stream: str
    draw: bool = True
    ls_dim: int = 0
    ls_init: float = 1e-5

    @nn.compact
    def __call__(self):
        gamma = None
        if self.ls_dim:
            from vsn_tpu.models.layers import LayerScale

            gamma = LayerScale(
                init_value=self.ls_init, dtype=jnp.float32,
                name="LayerScale_0",
            )(jnp.ones((self.ls_dim,), jnp.float32))
        rng = self.make_rng(self.stream) if self.draw else None
        return rng, gamma


class _NormParams(nn.Module):
    """nn.LayerNorm-compatible scale/bias params."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        return scale, bias


class _AttnParams(nn.Module):
    """WindowAttention3D-compatible params for the fused-kernel path."""

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    qkv_bias: bool
    enable_stable: bool
    attn_drop: float
    proj_drop: float

    @nn.compact
    def __call__(self):
        table_size = (
            (2 * self.window[0] - 1)
            * (2 * self.window[1] - 1)
            * (2 * self.window[2] - 1)
        )
        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            (table_size, self.num_heads),
            jnp.float32,
        )
        qkv_init = (
            stable_qkv_init(self.dim, self.attn_drop)
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        wqkv, bqkv = _DenseParams(
            self.dim, 3 * self.dim, use_bias=self.qkv_bias,
            kernel_init=qkv_init, name="qkv",
        )()
        proj_init = (
            normal_init(stable_vproj_std(self.dim, self.proj_drop))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        wproj, bproj = _DenseParams(
            self.dim, self.dim, use_bias=True,
            kernel_init=proj_init, name="proj",
        )()
        return bias_table, wqkv, bqkv, wproj, bproj


class _MlpParams(nn.Module):
    """Mlp-compatible fc1/fc2 params for the fused-kernel path."""

    dim: int
    hidden: int
    kernel_init: object = None

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(
            self.dim, self.hidden, kernel_init=self.kernel_init, name="fc1"
        )()
        w2, b2 = _DenseParams(
            self.hidden, self.dim, kernel_init=self.kernel_init, name="fc2"
        )()
        return w1, b1, w2, b2


class WindowAttention3D(nn.Module):
    """Window MSA with 3D relative-position bias
    (reference swin_transformer_3d.py:106-199).

    ``region_ids`` [W, N] (int32, W=nW for shifted layers, None otherwise)
    encodes the shifted-window mask; with ``use_pallas`` the whole
    bias+mask+softmax+PV pipeline runs in the fused VMEM kernel
    (vsn_tpu/ops/window_attention.py) — dropout on attention probabilities is
    only supported on the XLA path (ATTENTION_DROPOUT defaults to 0,
    config-defaults.yaml:68-70).
    """

    window: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    enable_stable: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, region_ids: Optional[jax.Array],
                 deterministic: bool = True):
        # x: [B*nW, N, C]
        bnw, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        table_size = (
            (2 * self.window[0] - 1)
            * (2 * self.window[1] - 1)
            * (2 * self.window[2] - 1)
        )
        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            (table_size, self.num_heads),
            jnp.float32,
        )
        qkv_init = (
            stable_qkv_init(c, self.attn_drop)
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=qkv_init, name="qkv",
        )(x)
        # banded-contraction expansion: gather-free fwd AND scatter-free bwd
        bias = expand_bias_table(bias_table, tuple(self.window))  # [H, N, N]

        # VMEM budget gate for the fused-qkv kernel: bias + dbias (f32)
        # dominate; fall back to XLA above ~10 MB (only Swin-L stage 4 hits
        # this).
        bias_vmem = 2 * self.num_heads * n * n * 4
        use_pallas = (
            self.use_pallas
            and (deterministic or self.attn_drop == 0.0)
            and bias_vmem < 10 * 1024 * 1024
            and jax.devices()[0].platform == "tpu"
        )
        if use_pallas:
            from vsn_tpu.ops.window_attention import fused_window_attention_qkv

            if region_ids is None:
                ids = jnp.zeros((1, n), jnp.int32)
            else:
                ids = region_ids.astype(jnp.int32)
            out = fused_window_attention_qkv(
                qkv, bias, ids, scale, self.num_heads
            )
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def split_heads(t):
                return t.reshape(
                    bnw, n, self.num_heads, head_dim
                ).transpose(0, 2, 1, 3)

            q, k, v = map(split_heads, (q, k, v))
            attn = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * scale
            attn = attn + bias[None]
            if region_ids is not None:
                nw = region_ids.shape[0]
                mask = jnp.where(
                    region_ids[:, :, None] != region_ids[:, None, :],
                    -100.0, 0.0,
                ).astype(jnp.float32)
                attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.reshape(bnw, self.num_heads, n, n)
            # saturation observability: the fused kernel's max-free softmax
            # clamps logits at 80 (exact below it, flattened above —
            # swin_block_kernels.py). Sown max logit makes the attention-
            # logit-growth regime this project studies visible; consumed by
            # the WATCH_GRADIENTS probe forward (train/step.py), no-op when
            # 'intermediates' isn't mutable.
            self.sow("intermediates", "attn_logit_max", jnp.max(attn),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.float32(-jnp.inf))
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhij,bhjd->bhid", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        out = out.astype(self.dtype)

        proj_init = (
            normal_init(stable_vproj_std(c, self.proj_drop))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        out = nn.Dense(c, dtype=self.dtype, kernel_init=proj_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


def fused_block_gate(use_pallas, post_norm, layer_scale, norm_layer,
                     dropout, attention_dropout, c, window, num_heads,
                     deterministic=False) -> bool:
    """Shared static gate for the fully-fused block kernels (SwinBlock3D
    delegates here; BasicLayer3D consults it to decide whether the stage may
    skip window padding in favor of the packed layout). LayerScale and
    post-norm ride the kernels in-band (gamma input + dgamma output;
    post_norm static moves norm1/norm2 onto the branch outputs), so neither
    gates. Both stay in the signature for call-site stability.

    Dropout rates only gate TRAINING forwards: with ``deterministic`` (eval,
    TTA) dropout is a no-op and the kernels are exact, so dropout-trained
    models keep the fast path at inference."""
    from vsn_tpu.ops.swin_block_kernels import attn_half_vmem_ok

    del layer_scale, post_norm
    n = window[0] * window[1] * window[2]
    return (
        use_pallas
        and norm_layer in (None, False, "nn.LayerNorm", "LayerNorm")
        and (deterministic or (dropout == 0.0 and attention_dropout == 0.0))
        and attn_half_vmem_ok(c, n, num_heads)
        and jax.devices()[0].platform == "tpu"
    )


class SwinBlock3D(nn.Module):
    """One (shifted-)window transformer block
    (reference swin_transformer_3d.py:202-382)."""

    num_heads: int
    window: Tuple[int, int, int]
    shift: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attention_dropout: float = 0.0
    drop_path_rate: float = 0.0
    post_norm: bool = False
    norm_layer: Optional[str] = None
    use_shakedrop: bool = False
    shakedrop_alpha_range: Tuple[float, float] = (-1.0, 1.0)
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    enable_stable: bool = False
    stable_lam: float = 1.0
    stable_beta: float = 0.0
    use_pallas: bool = False
    # Window-resident IO (BasicLayer3D's fused fast path): x is already the
    # partitioned-window tensor [B*nW, N, C] in this block's (rolled) layout
    # and is returned in the same form; the layer owns all layout moves.
    windows_io: bool = False
    io_dims: Optional[Tuple[int, int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, region_ids: Optional[jax.Array],
                 deterministic: bool = True):
        if self.windows_io:
            assert self.io_dims is not None and self._fused_ok(
                x.shape[-1], deterministic)
            return self._fused_call(x, region_ids, deterministic, None)
        b, d, h, w, c = x.shape
        norm_ctor = make_norm(self.norm_layer, self.dtype)
        residual_kw = dict(
            drop_path_rate=self.drop_path_rate,
            use_shakedrop=self.use_shakedrop,
            shakedrop_alpha_range=self.shakedrop_alpha_range,
            layer_scale=self.layer_scale,
            layer_scale_init_value=self.layer_scale_init_value,
            enable_stable=self.enable_stable,
            stable_lam=self.stable_lam,
            stable_beta=self.stable_beta,
            dtype=self.dtype,
        )
        shortcut = x
        shifted = any(s > 0 for s in self.shift)

        if self._fused_ok(c, deterministic):
            return self._fused_call(x, region_ids, deterministic, residual_kw)

        h_in = x if self.post_norm else norm_ctor(name="norm1")(x)
        if shifted:
            h_in = roll3d(
                h_in, (-self.shift[0], -self.shift[1], -self.shift[2])
            )
        windows = window_partition(h_in, self.window)
        attn_windows = WindowAttention3D(
            window=self.window,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attention_dropout,
            proj_drop=self.dropout,
            dtype=self.dtype,
            enable_stable=self.enable_stable,
            use_pallas=self.use_pallas,
            name="attn",
        )(windows, region_ids, deterministic)
        attn_out = window_reverse(attn_windows, self.window, (d, h, w))
        if shifted:
            attn_out = roll3d(attn_out, self.shift)
        if self.post_norm:
            attn_out = norm_ctor(name="norm1")(attn_out)
        x = ResidualBranch(**residual_kw, name="res1")(
            shortcut, attn_out, deterministic
        )

        h2 = x if self.post_norm else norm_ctor(name="norm2")(x)
        mlp_init = (
            normal_init(stable_vproj_std(c, self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        mlp_out = Mlp(
            hidden_features=int(c * self.mlp_ratio),
            dropout=self.dropout,
            dtype=self.dtype,
            kernel_init=mlp_init,
            name="mlp",
        )(h2, deterministic)
        if self.post_norm:
            mlp_out = norm_ctor(name="norm2")(mlp_out)
        x = ResidualBranch(**residual_kw, name="res2")(x, mlp_out, deterministic)
        return x

    def _fused_ok(self, c: int, deterministic: bool = False) -> bool:
        """Static gate for the fully-fused block kernels: LayerNorm
        (pre- OR post-norm and LayerScale ride the kernels in-band), zero
        dropout, VMEM fits, on TPU. The fused path declares a bit-identical
        param tree, so mixed init/apply environments (e.g. CPU init, TPU
        apply) interoperate."""
        return fused_block_gate(
            self.use_pallas, self.post_norm, self.layer_scale,
            self.norm_layer, self.dropout, self.attention_dropout,
            c, tuple(self.window), self.num_heads,
            deterministic=deterministic,
        )

    def _residual_gains(self, b: int, c: int, deterministic: bool,
                        name: str):
        """Per-sample (gf, gb) plus the optional LayerScale gamma for one
        residual, with the stable-residual branch gain absorbed — mirrors
        ResidualBranch's wrapper stack. The rng is drawn through a dummy
        submodule with ResidualBranch's name so the flax rng fold path (and
        hence every gating decision) and the gamma param tree match the
        unfused path bit-for-bit."""
        from vsn_tpu.models.layers import residual_branch_gains

        needs_rng = self.drop_path_rate > 0.0 and not deterministic
        gamma = None
        if needs_rng or self.layer_scale:
            rng, gamma = _ResDecor(
                stream="shakedrop" if self.use_shakedrop else "dropout",
                draw=needs_rng,
                ls_dim=c if self.layer_scale else 0,
                ls_init=self.layer_scale_init_value,
                name=name,
            )()
        else:
            rng = None
        gf, gb = residual_branch_gains(
            b, self.drop_path_rate, self.use_shakedrop,
            tuple(self.shakedrop_alpha_range), deterministic, rng,
        )
        beta = self.stable_beta if self.enable_stable else 1.0
        return gf * beta, gb * beta, gamma

    def _fused_call(self, x, region_ids, deterministic, residual_kw):
        """Fused-kernel block: each half (LN + projections + attention/MLP
        + residual with DropPath/ShakeDrop/stable gains) is one Pallas
        kernel; only roll and window partition/reverse remain XLA-side."""
        from vsn_tpu.ops.swin_block_kernels import (
            fused_attn_half,
            fused_ln_mlp,
            mlp_tiling,
        )

        if self.windows_io:
            d, h, w = self.io_dims
            c = x.shape[-1]
            nwin = int(np.prod([dim // ws
                                for dim, ws in zip((d, h, w), self.window)]))
            b = x.shape[0] // nwin
        else:
            b, d, h, w, c = x.shape
        n = self.window[0] * self.window[1] * self.window[2]
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        lam = float(self.stable_lam) if self.enable_stable else 1.0
        shifted = any(s > 0 for s in self.shift)

        lng1, lnb1 = _NormParams(c, name="norm1")()
        bias_table, wqkv, bqkv, wproj, bproj = _AttnParams(
            dim=c, num_heads=self.num_heads, window=tuple(self.window),
            qkv_bias=self.qkv_bias, enable_stable=self.enable_stable,
            attn_drop=self.attention_dropout, proj_drop=self.dropout,
            name="attn",
        )()
        bias = expand_bias_table(bias_table, tuple(self.window))  # [H, N, N]

        gf1, gb1, gamma1 = self._residual_gains(b, c, deterministic, "res1")
        divisible = all(
            dim % ws == 0 for dim, ws in zip((d, h, w), self.window)
        )
        if self.windows_io:
            # Layout (incl. any roll) is owned by BasicLayer3D; x IS the
            # window tensor and the residual stream stays window-ordered
            # (the MLP half is token-pointwise, so no reverse is needed).
            ids = (None if region_ids is None
                   else region_ids.astype(jnp.int32))
            x = fused_attn_half(
                x, lng1, lnb1, wqkv, bqkv, bias, ids, wproj, bproj,
                gf1, gb1, scale, self.num_heads, lam, gamma=gamma1,
                post_norm=self.post_norm,
            ).astype(self.dtype)
            # [b, rows, c] view (free: windows are sample-major) so the MLP
            # half below — incl. gated_residual's sample-axis-0 gain
            # broadcast — is layout-agnostic.
            x = x.reshape(b, d * h * w, c)
        elif divisible:
            # Residual add commutes with roll and window partition (both are
            # permutations), so the kernel adds its own rolled/partitioned
            # input as the shortcut and we invert the permutation after.
            h_in = x
            if shifted:
                h_in = roll3d(
                    h_in, (-self.shift[0], -self.shift[1], -self.shift[2])
                )
            windows = window_partition(h_in, self.window)  # raw, pre-norm
            ids = (None if region_ids is None
                   else region_ids.astype(jnp.int32))
            out_windows = fused_attn_half(
                windows, lng1, lnb1, wqkv, bqkv, bias, ids, wproj, bproj,
                gf1, gb1, scale, self.num_heads, lam, gamma=gamma1,
                post_norm=self.post_norm,
            )
            x = window_reverse(out_windows, self.window, (d, h, w))
            if shifted:
                x = roll3d(x, self.shift)
            x = x.astype(self.dtype)
        else:
            # Packed layout: real tokens bin-packed into V full-size virtual
            # windows; pack/unpack (incl. the roll for shifted blocks) is ONE
            # one-hot matmul each way, cross-window pairs are masked via the
            # composite ids, and the rel-pos bias is gathered per chunk with
            # selection matmuls. Cuts stage-3 tokens 2016 -> 1008 and removes
            # its rolls entirely. See the layout-module comment for the
            # pad-masking deviation note.
            shift3 = tuple(self.shift) if shifted else (0, 0, 0)
            geom = ((d, h, w), tuple(self.window), shift3)
            lay = packed_window_layout(*geom)
            pmat, smat = packed_window_onehots(*geom)
            pk = jnp.asarray(pmat, x.dtype)                # [V, N, L]
            sel = jnp.asarray(smat, jnp.float32)           # [V, N, N]
            pids = jnp.asarray(lay.ids)                    # [V, N]
            bias_packed = jnp.einsum(
                "vip,hpq,vjq->vhij", sel, bias, sel,
                preferred_element_type=jnp.float32,
            )
            x_flat = x.reshape(b, d * h * w, c)
            packed = jnp.einsum("vnl,blc->vbnc", pk, x_flat)
            outs = [
                fused_attn_half(
                    packed[v], lng1, lnb1, wqkv, bqkv, bias_packed[v],
                    pids[v][None], wproj, bproj, gf1, gb1, scale,
                    self.num_heads, lam, gamma=gamma1,
                    post_norm=self.post_norm,
                )
                for v in range(pk.shape[0])
            ]
            x = jnp.einsum("vnl,vbnc->blc", pk, jnp.stack(outs))
            x = x.reshape(b, d, h, w, c).astype(self.dtype)

        hidden = int(c * self.mlp_ratio)
        mlp_init = (
            normal_init(stable_vproj_std(c, self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        lng2, lnb2 = _NormParams(c, name="norm2")()
        w1, b1, w2, b2 = _MlpParams(
            dim=c, hidden=hidden, kernel_init=mlp_init, name="mlp"
        )()
        gf2, gb2, gamma2 = self._residual_gains(b, c, deterministic, "res2")
        rows = d * h * w
        # Pad each sample's rows as needed (packed-stage grids are not
        # multiples of 8; rounder row counts admit much larger tiles) —
        # zero rows flow LN->MLP harmlessly and their upstream grads are
        # zero. mlp_tiling maximizes rows-per-program under the VMEM cap.
        tile, pad_rows = mlp_tiling(rows, c, hidden)
        if tile:
            flat = x.reshape(b, rows, c)
            if pad_rows:
                flat = jnp.pad(flat, ((0, 0), (0, pad_rows), (0, 0)))
            out = fused_ln_mlp(
                flat.reshape(b * (rows + pad_rows), c),
                lng2, lnb2, w1, b1, w2, b2, gf2, gb2, tile, lam,
                gamma=gamma2, post_norm=self.post_norm,
            ).reshape(b, rows + pad_rows, c)
            if pad_rows:
                out = out[:, :rows]
            x = out.reshape(x.shape).astype(self.dtype)
        else:
            # fused MLP kernel not applicable; same math via XLA on the
            # declared params (incl. post-norm: fc1 reads raw x, norm2
            # applies to the branch output — mirrors the kernel)
            y = (x if self.post_norm
                 else _apply_layernorm(x, lng2, lnb2, self.dtype))
            h1 = jnp.dot(y, w1.astype(self.dtype)) + b1.astype(self.dtype)
            hact = nn.gelu(h1.astype(jnp.float32), approximate=False)
            mlp_out = (
                jnp.dot(hact.astype(self.dtype), w2.astype(self.dtype))
                + b2.astype(self.dtype)
            )
            if self.post_norm:
                mlp_out = _apply_layernorm(mlp_out, lng2, lnb2, self.dtype)
            if gamma2 is not None:
                mlp_out = (mlp_out.astype(jnp.float32) * gamma2).astype(
                    self.dtype)
            from vsn_tpu.models.layers import gated_residual

            x = gated_residual(x, mlp_out.reshape(x.shape), gf2, gb2, lam)
        if self.windows_io:
            return x.reshape(-1, n, c)
        return x


# Reference part order for the 8-neighbor concat (swin_transformer_3d.py:
# 546-572: x0..x7) and its inverse lookup by (dz, dy, dx) offset.
_MERGE_PARTS = (
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
)
_MERGE_PERM_LEX = np.argsort([p[0] * 4 + p[1] * 2 + p[2]
                              for p in _MERGE_PARTS])  # lex (dz,dy,dx) -> p


class PatchMerging3D(nn.Module):
    """8-neighbor concat -> LN -> Linear(8C -> 2C)
    (reference swin_transformer_3d.py:546-572).

    TPU formulation: LN-of-concat distributes into a strided conv. With
    z = concat(neighbors) [8C], mu/var its mean/variance, gamma/beta the LN
    affine and W the reduction kernel:

        LN(z) @ W = rstd * (z (*) gamma) @ W - rstd * mu * (gamma @ W)
                    + beta @ W
                  = rstd * Conv3d(x, diag(gamma) W; k=2, s=2)
                    - rstd * mu * (gamma @ W) + beta @ W

    and mu / E[z^2] are 2x2x2xC block means (one fused reshape-reduce).
    This removes the 8-way concat's 8-D transpose relayouts (~0.4-1.6 ms
    per fusion in the device trace) and rides XLA's conv kernels instead;
    the earlier reshape+transpose+slice form is kept as the test oracle
    (tests/test_swin3d.py). LayerNorm only; other NORM_LAYER options take
    the concat path. Param tree unchanged (norm/scale, norm/bias,
    reduction/kernel)."""

    norm_layer: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pads = [(0, d % 2), (0, h % 2), (0, w % 2)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0), *pads, (0, 0)])
            d, h, w = x.shape[1:4]

        if self.norm_layer not in (None, False, "nn.LayerNorm", "LayerNorm"):
            x = _merge_concat(x)
            x = make_norm(self.norm_layer, self.dtype)(name="norm")(x)
            return nn.Dense(
                2 * c, use_bias=False, dtype=self.dtype,
                kernel_init=trunc_normal_init(0.02), name="reduction",
            )(x)

        gamma, beta = _NormParams(8 * c, name="norm")()
        kernel, _ = _DenseParams(
            8 * c, 2 * c, use_bias=False,
            kernel_init=trunc_normal_init(0.02), name="reduction",
        )()

        xf = x.astype(jnp.float32)
        xr = xf.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        mu = xr.mean(axis=(2, 4, 6, 7))                  # [b, d2, h2, w2]
        # centered two-pass variance (mean of (x-mu)^2): the one-pass
        # E[x^2]-E[x]^2 form cancels catastrophically in f32 when block
        # means are large relative to spread — xr is already materialized,
        # so centering costs one subtract
        ctr = xr - mu[:, :, None, :, None, :, None, None]
        var = (ctr * ctr).mean(axis=(2, 4, 6, 7))
        rstd = jax.lax.rsqrt(var + 1e-5)

        wg = gamma[:, None] * kernel                     # [8C, 2C] f32
        conv_w = wg.reshape(8, c, 2 * c)[_MERGE_PERM_LEX].reshape(
            2, 2, 2, c, 2 * c
        )
        # output dtype = model dtype (like the Dense it replaces); a f32
        # preferred_element_type would make the VJP's transpose conv see
        # mixed bf16/f32 operands, which lax.conv rejects
        conv = jax.lax.conv_general_dilated(
            x.astype(self.dtype), conv_w.astype(self.dtype),
            window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(jnp.float32)                             # [b,d2,h2,w2,2C]
        gw = gamma @ kernel                               # [2C]
        bw = beta @ kernel                                # [2C]
        out = (
            rstd[..., None] * (conv - mu[..., None] * gw) + bw
        )
        return out.astype(self.dtype)


def _merge_concat(x: jax.Array) -> jax.Array:
    """The reference's 8-part channel concat (oracle / non-LN norms)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [b,d2,h2,w2, 2,2,2, c]
    parts = [x[:, :, :, :, dz, dy, dx, :] for dz, dy, dx in _MERGE_PARTS]
    return jnp.concatenate(parts, axis=-1)


class BasicLayer3D(nn.Module):
    """One stage: depth x SwinBlock3D with alternating shift + downsample
    (reference swin_transformer_3d.py:385-514)."""

    depth: int
    num_heads: int
    window: Tuple[int, int, int]
    drop_path_rates: Sequence[float]
    downsample: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attention_dropout: float = 0.0
    post_norm: bool = False
    norm_layer: Optional[str] = None
    use_checkpoint: bool = False
    use_shakedrop: bool = False
    shakedrop_alpha_range: Tuple[float, float] = (-1.0, 1.0)
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    enable_stable: bool = False
    stable_lam: float = 1.0
    stable_beta: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, d, h, w, c = x.shape
        window, shift = clamp_window(
            (d, h, w), self.window, tuple(ws // 2 for ws in self.window)
        )
        pad = [(ws - dim % ws) % ws for dim, ws in zip((d, h, w), window)]
        shifted = any(s > 0 for s in shift)
        use_packed = (
            any(pad)
            and packing_profitable((d, h, w), window)
            and fused_block_gate(
                self.use_pallas, self.post_norm, self.layer_scale,
                self.norm_layer, self.dropout, self.attention_dropout,
                c, window, self.num_heads, deterministic=deterministic,
            )
        )

        # Window-resident residual stream: when the stage is divisible and
        # every block takes the fused path, partition ONCE, hand windows
        # straight from block to block (the MLP half is token-pointwise),
        # bridge layout changes with a single window_glue permutation per
        # junction, and reverse ONCE at stage end — instead of each block
        # paying reverse -> unroll / roll -> partition around the opaque
        # MLP kernel. Exact same math/params. VSN_WINDOW_RESIDENT=0 reverts.
        env_wr = os.environ.get("VSN_WINDOW_RESIDENT")
        use_winres = (
            not any(pad)
            and fused_block_gate(
                self.use_pallas, self.post_norm, self.layer_scale,
                self.norm_layer, self.dropout, self.attention_dropout,
                c, window, self.num_heads, deterministic=deterministic,
            )
            and (env_wr.strip() not in ("0", "false", "off")
                 if env_wr else True)
        )

        ids_noshift = ids_shift = None
        if use_packed:
            # no stage padding: blocks derive the packed geometry (windows,
            # ids, bias selection) from their static shapes
            pass
        elif any(pad):
            x = jnp.pad(
                x, [(0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)]
            )
            # pad tokens are masked out of attention in EVERY block (see the
            # packed-layout deviation note; keeps padded and packed paths
            # numerically interchangeable)
            ids_noshift = jnp.asarray(
                padded_window_region_ids((d, h, w), window, (0, 0, 0))
            )
            if shifted:
                ids_shift = jnp.asarray(
                    padded_window_region_ids((d, h, w), window, shift)
                )
        elif shifted:
            ids_shift = jnp.asarray(
                shifted_window_region_ids((d, h, w), window, shift)
            )

        block_cls = SwinBlock3D
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock3D, static_argnums=(3,))
        if use_winres:
            from vsn_tpu.ops.window_relayout import (
                s2w_entry_active,
                spatial_to_windows,
            )

            if s2w_entry_active():
                # Pallas one-pass partition at stage ENTRY (roll = 0).
                # Step-level A/B (queue5, 2026-08-19): 57.40 vs 54.28
                # vol/s (+5.8%) — default ON on TPU (VSN_PALLAS_S2W=0
                # restores the reshape+transpose oracle below).
                x = spatial_to_windows(x, window, (0, 0, 0))
            else:
                x = window_partition(x, window)
        cur = tuple(0 for _ in window)
        for i in range(self.depth):
            blk_shift = tuple(0 for _ in window) if i % 2 == 0 else shift
            region_ids = ids_noshift if i % 2 == 0 else ids_shift
            if use_winres and blk_shift != cur:
                # bridge from layout rolled by -cur to rolled by -blk_shift.
                # The delta is taken mod the FULL spatial dims, not mod the
                # window: a shifted->unshifted junction needs roll(+s) =
                # roll(-(dim-s)), and collapsing that to -(ws-s) would leave
                # an uncompensated whole-window roll that later shifted
                # blocks' region-id masks (and the stage output) inherit.
                t = tuple((ns - cs) % dim
                          for ns, cs, dim in zip(blk_shift, cur, (d, h, w)))
                x = window_glue(x, window, (d, h, w), t)
                cur = blk_shift
            x = block_cls(
                use_pallas=self.use_pallas,
                num_heads=self.num_heads,
                window=window,
                shift=blk_shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                drop_path_rate=self.drop_path_rates[i],
                post_norm=self.post_norm,
                norm_layer=self.norm_layer,
                use_shakedrop=self.use_shakedrop,
                shakedrop_alpha_range=self.shakedrop_alpha_range,
                layer_scale=self.layer_scale,
                layer_scale_init_value=self.layer_scale_init_value,
                enable_stable=self.enable_stable,
                stable_lam=self.stable_lam,
                stable_beta=self.stable_beta,
                windows_io=use_winres,
                io_dims=(d, h, w) if use_winres else None,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, region_ids, deterministic)
        if use_winres:
            from vsn_tpu.ops.window_relayout import (
                relayout_active,
                windows_to_spatial,
            )

            if any(cur) and relayout_active():
                # one-pass Pallas reverse+roll whose adjoint is the rolled
                # partition (measured 7.09 vs XLA's 9.42 ms bwd at stage-1
                # micro 8 — scripts/perf_probe_relayout.py; fwd at par).
                # The unshifted case stays on XLA: plain reverse beats the
                # kernel there.
                x = windows_to_spatial(x, window, (d, h, w), cur)
            else:
                x = window_reverse(x, window, (d, h, w))
                if any(cur):
                    x = roll3d(x, cur)
            x = x.astype(self.dtype)

        x = x[:, :d, :h, :w, :]
        if self.downsample:
            x = PatchMerging3D(
                norm_layer=self.norm_layer, dtype=self.dtype, name="downsample"
            )(x)
        return x


class _PatchEmbedMatmul(nn.Module):
    """Conv3d(k = stride = patch) expressed as patchify + matmul.

    Declares nn.Conv-compatible params (kernel [kd, kh, kw, Cin, E] DHWIO +
    bias [E]); the contraction runs as [B*N, kd*kh*kw*Cin] @ [., E] on the
    MXU. A nothing-saveable jax.checkpoint recomputes the patchify relayout
    in backward so no padded patchified copy of the batch is kept alive
    (the round-1 OOM mode inside the grad-accumulation scan)."""

    patch_size: Tuple[int, int, int]
    embed_dim: int
    in_channels: int = 1
    kernel_init: object = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.patch_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, cin, self.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.embed_dim,),
            jnp.float32,
        )
        dt = self.dtype

        def embed(xx, w, b2):
            bsz, d, h, w_sp, _ = xx.shape
            gd, gh, gw = d // kd, h // kh, w_sp // kw
            xp = xx.reshape(bsz, gd, kd, gh, kh, gw, kw, cin)
            xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                bsz, gd, gh, gw, kd * kh * kw * cin
            )
            y = jnp.dot(
                xp.astype(dt), w.reshape(-1, self.embed_dim).astype(dt),
                preferred_element_type=jnp.float32,
            )
            return (y + b2).astype(dt)

        return jax.checkpoint(
            embed, policy=jax.checkpoint_policies.nothing_saveable
        )(x, kernel, bias)


class _PatchEmbedZConv(nn.Module):
    """Patch embed as a 2D conv with the kd z-taps folded into C_in.

    The direct 3D patchify conv (C_in=1) is layout-hostile on TPU: XLA
    relays the whole micro batch into a batch-minor layout before the conv
    (14.8 ms for [8,144,168,144,1] in the 2026-08-19 trace) and contracts
    K=1 per tap (11.1 ms fwd + 10.4 ms dW). Folding the z-taps into input
    channels via a LEADING-dim split — x[B, D, H, W] -> [B*D/kd, kd, H, W],
    layout-free, unlike the full patchify reshape that re-laid the scanned
    batch (see the VSN_PATCH_EMBED=matmul note) — turns it into an NCHW
    conv2d with C_in=kd whose input is the batch's natural layout.

    Param tree matches nn.Conv(name="patch_embed"): kernel [kd,kh,kw,cin,E]
    DHWIO + bias [E]; checkpoints are interchangeable.
    Reference: swin_transformer_3d.py:575-612 (PatchEmbed3D conv)."""

    patch_size: Tuple[int, int, int]
    embed_dim: int
    kernel_init: object = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.patch_size
        b, d, h, w_sp, cin = x.shape
        assert cin == 1, "zconv embed requires C_in=1 (use nn.Conv otherwise)"
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, cin, self.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.embed_dim,),
            jnp.float32,
        )
        dt = self.dtype
        gd = d // kd
        lhs = x.reshape(b * gd, kd, h, w_sp)          # leading split: free
        rhs = kernel[:, :, :, 0, :].transpose(1, 2, 0, 3)  # [kh,kw,kd,E]
        y = jax.lax.conv_general_dilated(
            lhs.astype(dt), rhs.astype(dt),
            window_strides=(kh, kw), padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
        )
        y = y + bias.astype(dt)
        return y.reshape(b, gd, h // kh, w_sp // kw, self.embed_dim)


class SwinTransformer3D(nn.Module):
    """Swin-3D classifier (reference swin_transformer_3d.py:575-785)."""

    patch_size: Tuple[int, int, int]
    num_classes: int
    embed_dim: int
    depths: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    window_size: Tuple[int, int, int]
    in_channels: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.1
    patch_norm: bool = True
    post_norm: bool = False
    norm_layer: Optional[str] = None
    use_checkpoint: bool = False
    enable_stable: bool = False
    stable_k: float = 2.0
    stable_alpha: float = 1.0
    use_shakedrop: bool = False
    shakedrop_alpha_range: Tuple[float, float] = (-1.0, 1.0)
    layer_scale: bool = False
    layer_scale_init_value: float = 1e-5
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, D, H, W, C]
        x = x.astype(self.dtype)
        b = x.shape[0]
        pad = [
            (p - s % p) % p for s, p in zip(x.shape[1:4], self.patch_size)
        ]
        if any(pad):
            x = jnp.pad(x, [(0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)])

        embed_fan_in = self.in_channels * int(np.prod(self.patch_size))
        embed_init = (
            normal_init(stable_embedding_std(embed_fan_in, self.dropout))
            if self.enable_stable
            else trunc_normal_init(0.02)
        )
        # Patch embed: nn.Conv by default. The patchify-matmul form
        # (_PatchEmbedMatmul, VSN_PATCH_EMBED=matmul — same param tree) is
        # +13% on the embed in isolation (the conv pays a pathological
        # C_in=1 backward-filter plus a ~4.9 ms input-layout copy), but
        # inside the grad-accum scan the patchify reshape forces XLA to
        # re-lay-out the WHOLE scanned batch with the micro dim in the
        # lanes: f16[accum, micro=32, D, H, W, 1] copies pad 32->128 (4x,
        # ~3.3 GB each for image+image2) and the full config OOMs
        # (measured r2: micro 32 + SAM + MixUp = 15.8/15.75 GB HBM). A
        # nothing-saveable checkpoint does NOT remove those copies — they
        # are input-layout copies, not saved activations. Step-level A/B:
        # conv 39.9 vol/s vs matmul 36.4 (and OOM with the packed layout).
        # The zconv form (VSN_PATCH_EMBED=zconv, _PatchEmbedZConv) wins big
        # in isolation (10.15->2.20 ms fwd) via a layout-free leading-dim
        # z-split, but measured a step-level wash (52.17 vs 52.2 vol/s,
        # 2026-08-19): the embed is off the critical path once the fused
        # window kernels dominate. Default stays conv.
        embed_mode = os.environ.get("VSN_PATCH_EMBED", "conv")
        if (embed_mode == "zconv" and x.shape[-1] == 1
                and x.shape[1] % self.patch_size[0] == 0):
            x = _PatchEmbedZConv(
                patch_size=tuple(self.patch_size),
                embed_dim=self.embed_dim,
                kernel_init=embed_init,
                dtype=self.dtype,
                name="patch_embed",
            )(x)
        elif embed_mode != "matmul":
            x = nn.Conv(
                self.embed_dim, kernel_size=tuple(self.patch_size),
                strides=tuple(self.patch_size), padding="VALID",
                kernel_init=embed_init, dtype=self.dtype, name="patch_embed",
            )(x)
        else:
            x = _PatchEmbedMatmul(
                patch_size=tuple(self.patch_size),
                embed_dim=self.embed_dim,
                in_channels=self.in_channels,
                kernel_init=embed_init,
                dtype=self.dtype,
                name="patch_embed",
            )(x)
        if self.patch_norm:
            x = make_norm(self.norm_layer, self.dtype)(name="patch_embed_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        total_blocks = sum(self.depths)
        if self.enable_stable:
            stable_lam, stable_beta = compute_residual_gains(
                total_blocks, self.stable_k, self.stable_alpha
            )
        else:
            stable_lam, stable_beta = 1.0, 0.0

        dpr = stochastic_depth_rates(self.stochastic_depth_prob, self.depths)
        n_layers = len(self.depths)
        for i in range(n_layers):
            off = sum(self.depths[:i])
            x = BasicLayer3D(
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window=tuple(self.window_size),
                drop_path_rates=tuple(dpr[off : off + self.depths[i]]),
                downsample=i < n_layers - 1,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                post_norm=self.post_norm,
                norm_layer=self.norm_layer,
                use_checkpoint=self.use_checkpoint,
                use_shakedrop=self.use_shakedrop,
                shakedrop_alpha_range=self.shakedrop_alpha_range,
                layer_scale=self.layer_scale,
                layer_scale_init_value=self.layer_scale_init_value,
                enable_stable=self.enable_stable,
                stable_lam=stable_lam,
                stable_beta=stable_beta,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, deterministic)

        x = make_norm(self.norm_layer, self.dtype)(name="norm")(x)
        x = x.mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d(1)
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02), name="head",
        )(x.astype(jnp.float32))
        return logits


def swin_from_config(cfg, dtype=jnp.float32) -> SwinTransformer3D:
    """Build from the public config keys (reference train_transformer.py:
    1968-2010 maps PATCH_SHAPE/EMBED_DIM/DEPTH/HEADS/WINDOW_SIZE directly)."""
    return SwinTransformer3D(
        patch_size=tuple(cfg.PATCH_SHAPE),
        num_classes=cfg.num_classes,
        # single-channel MRI is the reference default; IN_CHANNELS keeps
        # stable-init's embed fan-in honest for multi-channel data (the
        # conv infers C from the input, but stable_embedding_std cannot)
        in_channels=int(cfg.get("IN_CHANNELS", 1)),
        embed_dim=int(cfg.EMBED_DIM),
        depths=tuple(cfg.DEPTH),
        num_heads=tuple(cfg.HEADS),
        window_size=tuple(cfg.WINDOW_SIZE),
        mlp_ratio=float(cfg.MLP_RATIO),
        qkv_bias=bool(cfg.QKV_BIAS),
        dropout=float(cfg.DROPOUT),
        attention_dropout=float(cfg.ATTENTION_DROPOUT),
        stochastic_depth_prob=float(cfg.STOCHASTIC_DEPTH_PROB),
        patch_norm=bool(cfg.PATCH_NORM),
        post_norm=bool(cfg.POST_NORM),
        norm_layer=cfg.NORM_LAYER,
        use_checkpoint=bool(cfg.USE_CHECKPOINT),
        enable_stable=bool(cfg.ENABLE_STABLE),
        stable_k=float(cfg.STABLE_K),
        stable_alpha=float(cfg.STABLE_ALPHA),
        use_shakedrop=bool(cfg.USE_SHAKEDROP),
        shakedrop_alpha_range=tuple(cfg.SHAKEDROP_ALPHA_RANGE),
        layer_scale=bool(cfg.LAYER_SCALE),
        layer_scale_init_value=float(cfg.LAYER_SCALE_INIT_VALUE),
        use_pallas=bool(cfg.get("USE_PALLAS_ATTENTION", True)),
        dtype=dtype,
    )
