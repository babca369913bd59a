"""Fully-fused Swin block halves as Pallas TPU kernels.

Motivation (measured at micro 8, stage-1 Swin-T shapes, fwd+bwd): the
attention half-block costs 23.3 ms of which only ~10.7 ms is the v2
attention kernel — the rest is LN (5.2 ms), the qkv round trip (252 MB
HBM), and proj traffic; the LN+MLP half costs another 13.4 ms, and each
residual-branch elementwise pass ~2-4 ms. Every elementwise/relayout pass
over the [B, 36, 42, 36, 96] bf16 feature map runs at ~15% of HBM
bandwidth because the (W=36, C=96) trailing dims pad to (48, 128) bf16
tiles. In the partitioned [BW, N=252, C] window layout the padding waste
is 1.6%, so the fix is to do *everything* there:

  * ``fused_attn_half``: LN1 -> qkv projection -> per-head
    softmax(q k^T * scale + rel-pos bias + region mask) v -> merged-head
    proj -> residual ``lam * x + gf[s] * branch``, one VMEM program per
    window.
  * ``fused_ln_mlp``: LN2 -> fc1 -> exact GELU -> fc2 -> the same
    residual, on flat token tiles [T, C] (MLP needs no spatial
    structure).

The residual gains (gf forward, gb backward) are per-SAMPLE scalars fed
through SMEM: DropPath is gf = gb = mask/keep, ShakeDrop is
gf = gate?1:alpha, gb = gate?1:beta (the asymmetric custom-VJP semantics
of regularization/shakedrop.py:10-94), DeepScaleLM stable residuals set
lam/absorb beta into the gains. The backward pass applies
``dbranch = gb * do`` before the chain and returns
``dx = lam * do + chain(gb * do)``.

Both kernels carry full custom VJPs: parameter gradients (LN scale/bias,
qkv/proj and fc1/fc2 weights+biases, relative-position bias) are
accumulated into revisited output blocks across the sequential TPU grid —
the standard Pallas revisiting-output pattern. Matmul operand dtype
follows the input (bf16 models keep bf16 MXU operands, matching the XLA
path's bf16 Dense semantics; f32 stays f32 so the fused path agrees with
the unfused oracle to tight tolerance); softmax and LN statistics stay
f32.

LayerScale rides IN-BAND (optional gamma input + dgamma output; dgamma
accumulated as colsum(W (*) M) + b (*) s without branch recompute), and so
does post-norm (a static flag: qkv/fc1 read raw x, norm1/norm2 apply to the
branch outputs before gamma/gains). The remaining exclusions — mirrored
exactly by ``models/swin3d.fused_block_gate`` — are dropout or attention
dropout > 0 and non-LayerNorm NORM_LAYER variants; those configs fall back
to the unfused XLA path.

Reference semantics: models/swin_transformer_3d.py:106-199 (attention),
52-69 (MLP), 202-382 (block wiring incl. residual order).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsn_tpu.ops import window_attention as _wa
from vsn_tpu.ops.window_attention import _mask_from_ids
from vsn_tpu.utils.flags import env_flag

LN_EPS = 1e-5  # models/layers.py make_norm: nn.LayerNorm(epsilon=1e-5)

# Stage-3/4 backward kernels keep f32 weight blocks + their grad
# accumulators resident (e.g. Swin-T stage 4: ~18 MB scoped), past the
# 16 MB default scoped-VMEM limit. v5e has 128 MB VMEM; leave headroom for
# double-buffered DMA.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_SQRT_2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _ln_fwd(x, g, b):
    """LayerNorm over the last dim, f32. Returns (y, xhat, rstd)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd(dy, g, xhat, rstd):
    """Given upstream dy, return (dx, dg_partial, db_partial)."""
    red = tuple(range(dy.ndim - 1))
    dg = jnp.sum(dy * xhat, axis=red)
    db = jnp.sum(dy, axis=red)
    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7) — Mosaic
    TPU has no erf lowering; this uses only exp, which it supports. The
    error is far below bf16 resolution, so the kernel still matches
    nn.gelu(approximate=False) to test tolerance."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf(h / _SQRT_2))


def _gelu_grad(h):
    cdf = 0.5 * (1.0 + _erf(h / _SQRT_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
    return cdf + h * pdf


def _mm_dtype(x_dtype) -> jnp.dtype:
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _slot_gains(g_ref, pid, wb, nw):
    """Gain scalars for a window-batched program's flat [WB*N, C] tokens.

    Windows are sample-major (bw = B * nW). When wb divides nW every slot of
    a program belongs to one sample -> a single scalar. Otherwise (nW == 1,
    slots span samples — stage 4 / packed chunks) each slot indexes its own
    sample -> a list of wb scalars, applied per-slot by ``_apply_gains``
    (a [WB*N, 1] row-vector build needs a 2D->2D shape cast Mosaic cannot
    lower)."""
    if nw % wb == 0:
        return g_ref[pid * wb // nw, 0]
    return [g_ref[(pid * wb + k) // nw, 0] for k in range(wb)]


def _apply_gains(gains, t, n):
    """t [WB*N, C] scaled by a shared scalar or per-slot scalar list."""
    if not isinstance(gains, list):
        return gains * t
    return jnp.concatenate(
        [g * t[s * n:(s + 1) * n] for s, g in enumerate(gains)], axis=0
    )


def _slot_mask_list(ids_ref, shared_ids, wb):
    """Per-slot additive region masks, each [N, N].

    ids_ref block is [1, wb, N] (3D so the Mosaic last-two-dims tiling rule
    is satisfied for any wb). Intentional numeric difference vs the unfused
    XLA path: _mask_from_ids uses NEG_INF=-1e9 where the reference (and the
    unfused path) add -100.0 — softmax weights underflow to ~0 either way,
    parity tests pass at 1e-4, and -1e9 keeps masked logits unambiguous
    after the f32 bias adds. ``ids_ref`` None (statically maskless — the
    unshifted-block / full-sequence ViT case) skips the mask build and the
    per-head adds entirely (several [N, N] VPU passes per program)."""
    if ids_ref is None:
        return [None] * wb
    if shared_ids:
        m = _mask_from_ids(ids_ref[0, 0])
        return [m] * wb
    return [_mask_from_ids(ids_ref[0, s]) for s in range(wb)]


def _heads_attention_fwd(qkv, bias_ref, mask, scale, n_heads, cdt,
                         need_probs=False):
    """qkv [N, 3C] f32 -> merged-head attention output [N, C] f32, plus the
    per-head probability list for reuse in the backward pass (built only
    when ``need_probs`` — the forward kernel discards them). Strictly 2D:
    batched 3D dots measured slower than unrolled per-window 2D matmuls.
    ``bias_ref`` may be None (no relative-position bias — the ViT path).

    Softmax keeps the "thinning" win — the 1/sum normalization is deferred
    onto the [N, d] head output instead of a full [N, N] divide pass —
    algebraically identical: (exp(s) @ v) * r == softmax(s) @ v with
    r = 1/sum(exp(s)).

    The shift is gated (``softmax_rowmax_active``):
      * rowmax ON (safe softmax): u = exp(s - max(rowmax(s), 0)). Exact at
        ANY logit scale — the round-4 convergence run showed the flagship
        instability recipe drives attn_logit_max to 200+, where the old
        absolute clamp both flattened saturated rows AND zeroed the
        gradient that would restore the top logit (d/ds exp(min(s,80)) = 0
        past 80), de-faithing the training dynamics in exactly the regime
        this project studies (reference utils/stable_init.py premise).
        Clamping the shift at 0 keeps fully-masked rows (all -1e9) at
        u = 0 -> output 0, byte-identical to the clamp form, and costs one
        [N, N] rowwise max-reduce per head (the subtract fuses into the
        exp pass).
      * rowmax OFF: the round-2/3 absolute clamp u = exp(min(s, 80)) — one
        fewer [N, N] pass; exact only while logits stay below 80.
    Additive -1e9 masks flush to exactly exp(-1e9) = 0 in both forms."""
    c = qkv.shape[-1] // 3
    d = c // n_heads
    rowmax = softmax_rowmax_active()
    outs, probs = [], []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d].astype(cdt)
        k = qkv[:, c + h * d:c + (h + 1) * d].astype(cdt)
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d].astype(cdt)
        s = _mm(q, k, 1, 1) * scale                         # [N, N]
        if mask is not None:
            s = s + mask
        if bias_ref is not None:
            s = s + bias_ref[h]
        if rowmax:
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
            u = jnp.exp(s - m)
        else:
            u = jnp.exp(jnp.minimum(s, 80.0))
        # +1e-30 (far below f32 epsilon of any real row sum, so bitwise
        # inert there) keeps r finite if EVERY logit in a row underflows
        # exp() — possible only with unbounded inputs (post-norm reads the
        # raw residual stream); without it r = 1/0 = inf -> NaN outputs.
        # Such a row outputs 0 instead of the reference's max-subtracted
        # softmax mean — finite, and observable via attn_logit_max.
        r = 1.0 / (jnp.sum(u, axis=-1, keepdims=True) + 1e-30)  # [N, 1]
        outs.append(_mm(u.astype(cdt), v, 1, 0) * r)
        if need_probs:
            probs.append((u, r))  # (u, r) basis — p = u * r never built
    return jnp.concatenate(outs, axis=-1), probs


def _mm(a, b, contract_a, contract_b):
    """2D matmul contracting one axis each, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# fused attention half: LN1 + qkv + window attention + proj + residual
# ---------------------------------------------------------------------------
#
# The grid batches WB windows per program (``attn_window_batch``): one
# program LNs + projects + attends WB windows with all matmuls batched over
# the slot axis. Fewer, larger programs amortize grid/DMA overhead and keep
# weight blocks resident — measured the dominant stage-1 cost at WB=1
# (1728 programs of ~250 tokens each at micro 8).

def _mmw(a, w, w_axis=0):
    """Contract a's last axis with weight axis ``w_axis`` (no batch dims)."""
    return jax.lax.dot_general(
        a, w, (((a.ndim - 1,), (w_axis,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attn_fwd_kernel(gf_ref, ids_ref, x_ref, lng_ref, lnb_ref, wqkv_ref,
                     bqkv_ref, bias_ref, wproj_ref, bproj_ref, gamma_ref,
                     out_ref, *, scale, n_heads, lam, nw, wb, shared_ids,
                     has_bias, has_ls, post_norm, has_mask=True):
    """Window-batched flat form: LN/qkv/proj run ONCE on the [WB*N, C] token
    matrix (amortizing program launches and growing the matmul M dim);
    attention stays per-slot 2D matmuls in an unrolled loop (batched 3D dots
    measured slower than 2D on Mosaic). ``post_norm`` moves norm1 from the
    block input to the branch output (reference post-norm variant,
    swin_transformer_3d.py:202-382): qkv reads raw x and LN applies to the
    proj output before LayerScale/gains."""
    n = x_ref.shape[1]
    cdt = _mm_dtype(x_ref.dtype)
    gf = _slot_gains(gf_ref, pl.program_id(0), wb, nw)
    masks = _slot_mask_list(ids_ref if has_mask else None, shared_ids, wb)
    bias = bias_ref if has_bias else None
    x = x_ref[...].reshape(wb * n, -1).astype(jnp.float32)
    if post_norm:
        y = x
    else:
        y, _, _ = _ln_fwd(x, lng_ref[0], lnb_ref[0])
    qkv = _mmw(y.astype(cdt), wqkv_ref[...].astype(cdt)) + bqkv_ref[0]
    aos = [
        _heads_attention_fwd(
            qkv[s * n:(s + 1) * n], bias, masks[s], scale, n_heads, cdt
        )[0]
        for s in range(wb)
    ]
    ao = aos[0] if wb == 1 else jnp.concatenate(aos, axis=0)
    branch = _mmw(ao.astype(cdt), wproj_ref[...].astype(cdt)) + bproj_ref[0]
    if post_norm:
        branch, _, _ = _ln_fwd(branch, lng_ref[0], lnb_ref[0])
    if has_ls:
        branch = branch * gamma_ref[0]
    out = lam * x + _apply_gains(gf, branch, n)
    out_ref[...] = out.reshape(x_ref.shape).astype(out_ref.dtype)


def _heads_attention_bwd(qkv, probs, dao, bias_ref, scale, n_heads, cdt,
                         dbias_acc):
    """Per-window attention backward, strictly 2D. ``qkv``/``dao`` are one
    slot's [N, 3C]/[N, C]; accumulates per-head ds into ``dbias_acc`` (a
    list of per-head f32 [N, N] partials, or Nones on first use) and
    returns the slot's [N, 3C] dqkv.

    Rebuilds p = u * r FIRST and works in the bounded p-basis:
      dv = p^T @ do
      ds = p (*) dp - rowsum(p (*) dp) (*) p
    Same [N, N] elementwise-pass count as the (u, r)-basis form
    (p = u*r, p*dp, fused multiply-subtract vs u*dp, r*w, (r^2 s1)*u),
    but every intermediate is bounded: the original (u, r) form broke in
    the SATURATED regime this project studies — r^2 underflows f32 once a
    row's sum(exp) exceeds ~1e19 (max logit ~44), silently dropping the
    softmax projection term (wrong grads -> logit runaway), and u (*) dp
    overflows to inf once logits clamp at 80 with O(10) cotangents
    (inf * 0 -> NaN). Found by the round-4 convergence run
    (artifacts/convergence_swin5c.jsonl, divergence onset at
    attn_logit_max ~44); regression-tested by
    tests/test_swin_block_kernels.py::test_fused_attn_grads_at_saturation."""
    c = dao.shape[-1]
    d = c // n_heads
    parts_q, parts_k, parts_v = [], [], []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d].astype(cdt)
        k = qkv[:, c + h * d:c + (h + 1) * d].astype(cdt)
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d].astype(cdt)
        u, r = probs[h]
        p = u * r                                             # [N, N] <= 1
        doh = dao[:, h * d:(h + 1) * d]

        dv = _mm(p.astype(cdt), doh.astype(cdt), 0, 0)        # [N, d]
        dp = _mm(doh.astype(cdt), v, 1, 1)                    # [N, N]
        w = p * dp
        s1 = jnp.sum(w, axis=-1, keepdims=True)
        ds = w - s1 * p
        dsb = ds.astype(cdt)
        dq = _mm(dsb, k, 1, 0) * scale
        dk = _mm(dsb, q, 0, 0) * scale
        dbias_acc[h] = ds if dbias_acc[h] is None else dbias_acc[h] + ds
        parts_q.append(dq)
        parts_k.append(dk)
        parts_v.append(dv)
    return jnp.concatenate(parts_q + parts_k + parts_v, axis=-1)


def _attn_bwd_kernel(gb_ref, ids_ref, x_ref, lng_ref, lnb_ref, wqkv_ref,
                     bqkv_ref, bias_ref, wproj_ref, bproj_ref, gamma_ref,
                     do_ref, dx_ref, dlng_ref, dlnb_ref, dwqkv_ref,
                     dbqkv_ref, dbias_ref, dwproj_ref, dbproj_ref,
                     dgamma_ref, *, scale, n_heads, lam, nw, wb, shared_ids,
                     has_bias, has_ls, post_norm, has_mask=True):
    """Flat-form backward mirroring ``_attn_fwd_kernel``: LN/qkv/proj grads
    run once on the [WB*N, C] token matrix (outer products stay 2D with the
    token axis as the contraction dim); the attention chain stays per-slot
    2D matmuls."""
    first = pl.program_id(0) == 0
    n = x_ref.shape[1]
    masks = _slot_mask_list(ids_ref if has_mask else None, shared_ids, wb)
    bias = bias_ref if has_bias else None

    @pl.when(first)
    def _():
        dlng_ref[...] = jnp.zeros_like(dlng_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)

    # --- recompute forward ---
    cdt = _mm_dtype(x_ref.dtype)
    x = x_ref[...].reshape(wb * n, -1).astype(jnp.float32)
    lng = lng_ref[0]
    if post_norm:
        y, xhat, rstd = x, None, None
    else:
        y, xhat, rstd = _ln_fwd(x, lng, lnb_ref[0])
    qkv = _mmw(y.astype(cdt), wqkv_ref[...].astype(cdt)) + bqkv_ref[0]
    slot_aos, slot_probs = [], []
    for s in range(wb):
        ao_s, probs_s = _heads_attention_fwd(
            qkv[s * n:(s + 1) * n], bias, masks[s], scale, n_heads, cdt,
            need_probs=True,
        )
        slot_aos.append(ao_s)
        slot_probs.append(probs_s)
    ao = slot_aos[0] if wb == 1 else jnp.concatenate(slot_aos, axis=0)

    # --- backward ---
    do_res = do_ref[...].reshape(wb * n, -1).astype(jnp.float32)
    do = _apply_gains(_slot_gains(gb_ref, pl.program_id(0), wb, nw),
                      do_res, n)
    if post_norm:
        # branch -> LN -> [gamma] -> gains: recompute the proj output, run
        # LN stats on it, then chain do through gamma and the LN backward.
        branch = _mmw(ao.astype(cdt), wproj_ref[...].astype(cdt)) \
            + bproj_ref[0]
        bn, bn_xhat, bn_rstd = _ln_fwd(branch, lng, lnb_ref[0])
        if has_ls:
            dgamma_ref[0] += jnp.sum(do * bn, axis=0)
            do = do * gamma_ref[0]
        dbranch, dg_pn, db_pn = _ln_bwd(do, lng, bn_xhat, bn_rstd)
        dlng_ref[0] += dg_pn
        dlnb_ref[0] += db_pn
        dwproj_ref[...] += _mm(ao.astype(cdt), dbranch.astype(cdt), 0, 0)
        dbproj_ref[0] += jnp.sum(dbranch, axis=0)
        do = dbranch
    else:
        # LayerScale: with M = ao^T @ do and s = sum(do), the gamma'd
        # grads are dwproj = M (*) gamma, dbproj = s (*) gamma, dgamma =
        # colsum(wproj (*) M) + bproj (*) s — no branch recompute needed.
        proj_m = _mm(ao.astype(cdt), do.astype(cdt), 0, 0)
        proj_s = jnp.sum(do, axis=0)
        if has_ls:
            gamma = gamma_ref[0]
            dgamma_ref[0] += (jnp.sum(wproj_ref[...] * proj_m, axis=0)
                              + bproj_ref[0, :] * proj_s)
            dwproj_ref[...] += proj_m * gamma
            dbproj_ref[0] += proj_s * gamma
            do = do * gamma
        else:
            dwproj_ref[...] += proj_m
            dbproj_ref[0] += proj_s
    dao = _mmw(do.astype(cdt), wproj_ref[...].astype(cdt), w_axis=1)

    dbias_acc = [None] * n_heads
    slot_dqkv = [
        _heads_attention_bwd(
            qkv[s * n:(s + 1) * n], slot_probs[s], dao[s * n:(s + 1) * n],
            bias, scale, n_heads, cdt, dbias_acc,
        )
        for s in range(wb)
    ]
    if has_bias:
        for h in range(n_heads):
            dbias_ref[h] += dbias_acc[h]
    dqkv = slot_dqkv[0] if wb == 1 else jnp.concatenate(slot_dqkv, axis=0)

    dwqkv_ref[...] += _mm(y.astype(cdt), dqkv.astype(cdt), 0, 0)
    dbqkv_ref[0] += jnp.sum(dqkv, axis=0)
    dy = _mmw(dqkv.astype(cdt), wqkv_ref[...].astype(cdt), w_axis=1)
    if post_norm:
        dx = dy
    else:
        dx, dg, db = _ln_bwd(dy, lng, xhat, rstd)
        dlng_ref[0] += dg
        dlnb_ref[0] += db
    dx_ref[...] = (lam * do_res + dx).reshape(x_ref.shape).astype(
        dx_ref.dtype)


def softmax_rowmax_active() -> bool:
    """VSN_ATTN_ROWMAX gate: safe softmax (rowmax-subtracted exp) in the
    fused attention kernels instead of the absolute clamp at 80.

    Default ON — a correctness default, not a perf one: the round-4
    convergence run (artifacts/convergence_swin5c_saturated.jsonl) showed
    the flagship instability recipe reaches attn_logit_max 200+ within 400
    steps, where the clamp form both flattens the forward and zeroes the
    restoring gradient on the top logit. Exactness at saturation is this
    project's subject matter (reference utils/stable_init.py, SURVEY §2.1
    #24); the extra rowwise max-reduce was measured at the step level
    (see BASELINE.md round-4 entry) before keeping the default.
    """
    flag = env_flag("VSN_ATTN_ROWMAX")
    return True if flag is None else flag


def attn_window_batch(n_windows: int, nsamp: int, n: int, c: int,
                      n_heads: int) -> int:
    """Windows per kernel program (the grid covers bw // wb programs).

    Measured (dispatch-free chain probe, stage-1 shapes, the flat [WB*N, C]
    kernel form): fwd 3.95/3.44/3.27/3.38 ms per kernel at wb=1/4/8/12,
    fwd+bwd 12.75/12.02/12.37/13.67 — window batching amortizes program
    launches and grows the LN/qkv/proj matmul M dim. BUT at full-step level
    the win rounds to zero (bench 45.9 wb=1 vs 45.6 at wb=8) while the per-slot unrolling ballooned the train-step compile
    from ~3 to ~23 min — so the default stays 1 and the env knob remains
    for shape-specific experiments. (The round-1 3D-dot kernel form
    measured wb=1 fastest per-kernel too, for a different reason: batched
    3D dots lower poorly on Mosaic.)
    """
    units = n_windows if n_windows > 1 else nsamp
    env = os.environ.get("VSN_ATTN_WB")
    if env:
        try:
            wb = int(env)
        except ValueError:
            wb = 0  # malformed knob: fall through to the default
        if wb > 1 and units % wb == 0 and attn_half_vmem_ok(
                c, n, n_heads, wb):
            return wb
    return 1


def _attn_specs(n, c, n_heads, w, nsamp, wb, has_bias=True):
    blk = lambda shape: pl.BlockSpec(
        shape, lambda bi: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec((wb, n, c), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    if w == 1:
        ids_spec = pl.BlockSpec((1, 1, n), lambda bi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # windows are sample-major and wb | w, so program bi covers ids
        # group (bi % (w//wb)) of the [W//wb, wb, N] table (3D so the block
        # satisfies Mosaic's last-two-dims tiling rule for any wb)
        ids_spec = pl.BlockSpec((1, wb, n), lambda bi: (bi % (w // wb), 0, 0),
                                memory_space=pltpu.VMEM)
    # Whole per-SAMPLE gains array in SMEM for every program; indexed
    # in-kernel per slot. SMEM scalars cost ~512 B each, so the array must
    # stay per-sample (a per-window [BW] array overflows the 1 MB SMEM at
    # micro-batch 16).
    gain_spec = pl.BlockSpec((nsamp, 1), lambda bi: (0, 0),
                             memory_space=pltpu.SMEM)
    return dict(
        x=x_spec,
        ids=ids_spec,
        gain=gain_spec,
        lnv=blk((1, c)),
        wqkv=blk((c, 3 * c)),
        bqkv=blk((1, 3 * c)),
        bias=blk((n_heads, n, n) if has_bias else (1, 1, 1)),
        wproj=blk((c, c)),
        bproj=blk((1, c)),
    )


def _attn_half_fwd(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                   gf, gb, scale, n_heads, lam, gamma=None,
                   post_norm=False):
    bw, n, c = x.shape
    has_mask = ids is not None
    if not has_mask:
        ids = jnp.zeros((1, n), jnp.int32)
    w = ids.shape[0]
    nsamp = gf.shape[0]
    nw = bw // nsamp
    has_bias = bias is not None
    has_ls = gamma is not None
    wb = attn_window_batch(w if w > 1 else nw, nsamp, n, c, n_heads)
    sp = _attn_specs(n, c, n_heads, w, nsamp, wb, has_bias)
    bias_arg = bias if has_bias else jnp.zeros((1, 1, 1), jnp.float32)
    gamma_arg = gamma if has_ls else jnp.zeros((c,), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel, scale=scale, n_heads=n_heads, lam=lam,
            nw=nw, wb=wb, shared_ids=(w == 1), has_bias=has_bias,
            has_ls=has_ls, post_norm=post_norm, has_mask=has_mask,
        ),
        grid=(bw // wb,),
        in_specs=[sp["gain"], sp["ids"], sp["x"], sp["lnv"], sp["lnv"],
                  sp["wqkv"], sp["bqkv"], sp["bias"], sp["wproj"],
                  sp["bproj"], sp["lnv"]],
        out_specs=sp["x"],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(gf.reshape(nsamp, 1), ids.reshape(max(w // wb, 1), -1, n), x,
      lng.reshape(1, c), lnb.reshape(1, c), wqkv, bqkv.reshape(1, 3 * c),
      bias_arg, wproj, bproj.reshape(1, c), gamma_arg.reshape(1, c))


def _attn_half_bwd_arrays(x, lng, lnb, wqkv, bqkv, bias_arg, ids, wproj,
                          bproj, gamma_arg, gb, do, scale, n_heads, lam,
                          has_bias, has_ls, post_norm, has_mask=True):
    """Backward pallas call on concrete arrays; returns the 9 grad arrays
    (dx, dlng, dlnb, dwqkv, dbqkv, dbias, dwproj, dbproj, dgamma)."""
    bw, n, c = x.shape
    w = ids.shape[0]
    nsamp = gb.shape[0]
    nw = bw // nsamp
    wb = attn_window_batch(w if w > 1 else nw, nsamp, n, c, n_heads)
    sp = _attn_specs(n, c, n_heads, w, nsamp, wb, has_bias)
    f32 = jnp.float32
    (dx, dlng, dlnb, dwqkv, dbqkv, dbias, dwproj, dbproj,
     dgamma) = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=scale, n_heads=n_heads, lam=lam,
            nw=nw, wb=wb, shared_ids=(w == 1), has_bias=has_bias,
            has_ls=has_ls, post_norm=post_norm, has_mask=has_mask,
        ),
        grid=(bw // wb,),
        in_specs=[sp["gain"], sp["ids"], sp["x"], sp["lnv"], sp["lnv"],
                  sp["wqkv"], sp["bqkv"], sp["bias"], sp["wproj"],
                  sp["bproj"], sp["lnv"], sp["x"]],
        out_specs=(sp["x"], sp["lnv"], sp["lnv"], sp["wqkv"], sp["bqkv"],
                   sp["bias"], sp["wproj"], sp["bproj"], sp["lnv"]),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct(bias_arg.shape, f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(gb.reshape(nsamp, 1), ids.reshape(max(w // wb, 1), -1, n), x,
      lng.reshape(1, c), lnb.reshape(1, c), wqkv, bqkv.reshape(1, 3 * c),
      bias_arg, wproj, bproj.reshape(1, c), gamma_arg.reshape(1, c), do)
    return (dx, dlng.reshape(c), dlnb.reshape(c), dwqkv,
            dbqkv.reshape(3 * c), dbias, dwproj, dbproj.reshape(c),
            dgamma.reshape(c))


def _attn_half_bwd(scale, n_heads, lam, post_norm, res, do):
    x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj, gf, gb, gamma = res
    has_bias = bias is not None
    has_ls = gamma is not None
    has_mask = ids is not None
    bias_arg = bias if has_bias else jnp.zeros((1, 1, 1), jnp.float32)
    c = x.shape[-1]
    gamma_arg = gamma if has_ls else jnp.zeros((c,), jnp.float32)
    ids_arg = ids if has_mask else jnp.zeros((1, x.shape[1]), jnp.int32)
    if len(jax.devices()) > 1:
        fn = _attn_bwd_sharded(scale, n_heads, lam, has_bias, has_ls,
                               post_norm, has_mask)
        grads = fn(x, lng, lnb, wqkv, bqkv, bias_arg, ids_arg, wproj, bproj,
                   gamma_arg, gb.reshape(-1), do)
    else:
        grads = _attn_half_bwd_arrays(
            x, lng, lnb, wqkv, bqkv, bias_arg, ids_arg, wproj, bproj,
            gamma_arg, gb.reshape(-1), do, scale, n_heads, lam, has_bias,
            has_ls, post_norm, has_mask,
        )
    dx, dlng, dlnb, dwqkv, dbqkv, dbias, dwproj, dbproj, dgamma = grads
    return (dx, dlng, dlnb, dwqkv, dbqkv, dbias if has_bias else None, None,
            dwproj, dbproj, jnp.zeros_like(gf), jnp.zeros_like(gb),
            dgamma if has_ls else None)


# ---------------------------------------------------------------------------
# SPMD partitioning: keep batch sharding through the opaque pallas calls
# ---------------------------------------------------------------------------
#
# Under a sharded jit XLA cannot see inside a pallas custom call, and the
# partitioner defaults to FULL REPLICATION — measured on an 8-device mesh,
# one un-wrapped attn-half forced 7 all-gathers and returned a replicated
# output, which on a real pod would all-gather every block's activations
# (the reference's DP never has this problem because DDP wraps whole-module
# replicas — /root/reference/train/train_transformer.py:2099-2108). These
# custom_partitioning wrappers declare the data-parallel contract the
# kernels already satisfy: tokens and per-sample gains shard on dim 0
# (sample-major, so any axis size dividing the sample count aligns with
# sample boundaries), parameters are replicated, and backward parameter
# grads are psum'd over the batch axes inside the per-shard lowering.
# Engaged only when >1 device is visible; the single-chip path is unchanged.

def _dim0_axes(sharding):
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


def _spmd_wrap(fn_global, make_lower, batched, n_out_batched, rule):
    """custom_partitioning wrapper for a batch-dim-0 data-parallel kernel.

    batched: indices of args sharded on dim 0 (tokens, gains, cotangents);
    n_out_batched: leading outputs sharded like arg 0 (the rest are psum'd
    parameter grads, replicated); rule: shardy einsum-like sharding rule.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    f = custom_partitioning(fn_global)

    def _out_shardings(mesh, b_ax, result_shape):
        outs = jax.tree.leaves(result_shape)
        shs = []
        for i, o in enumerate(outs):
            if i < n_out_batched:
                shs.append(NamedSharding(
                    mesh, PartitionSpec(b_ax, *([None] * (o.ndim - 1)))))
            else:
                shs.append(NamedSharding(
                    mesh, PartitionSpec(*([None] * o.ndim))))
        return shs[0] if len(shs) == 1 else tuple(shs)

    def partition(mesh, arg_shapes, result_shape):
        b_ax = _dim0_axes(arg_shapes[0].sharding)
        arg_sh = tuple(
            NamedSharding(
                mesh,
                PartitionSpec(
                    b_ax if i in batched else None,
                    *([None] * (a.ndim - 1)),
                ),
            )
            for i, a in enumerate(arg_shapes)
        )
        lower = make_lower(b_ax)
        return mesh, lower, _out_shardings(mesh, b_ax, result_shape), arg_sh

    def infer(mesh, arg_shapes, result_shape):
        b_ax = _dim0_axes(arg_shapes[0].sharding)
        return _out_shardings(mesh, b_ax, result_shape)

    f.def_partition(partition=partition,
                    infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return f


_ATTN_FWD_RULE = ("bw n c, c1, c2, c3 q, q1, h m1 m2, wi m3, c4 c5, c6, "
                  "c7, b, b2 -> bw n c")
_ATTN_BWD_RULE = ("bw n c, c1, c2, c3 q, q1, h m1 m2, wi m3, c4 c5, c6, "
                  "c7, b, bw n c -> bw n c, g1, g2, g3 g4, g5, h2 g6 g7, "
                  "g8 g9, g10, g11")
_MLP_FWD_RULE = "t c, c1, c2, c3 hd, hd1, hd2 c4, c5, c6, b, b2 -> t c"
_MLP_BWD_RULE = ("t c, c1, c2, c3 hd, hd1, hd2 c4, c5, c6, b, t c -> "
                 "t c, g1, g2, g3 g4, g5, g6 g7, g8, g9")


@functools.lru_cache(maxsize=None)
def _attn_fwd_sharded(scale, n_heads, lam, has_bias, has_ls,
                      post_norm=False, has_mask=True):
    def fn(x, lng, lnb, wqkv, bqkv, bias_arg, ids, wproj, bproj, gamma_arg,
           gf, gb):
        return _attn_half_fwd(
            x, lng, lnb, wqkv, bqkv, bias_arg if has_bias else None,
            ids if has_mask else None,
            wproj, bproj, gf, gb, scale, n_heads, lam,
            gamma=gamma_arg if has_ls else None, post_norm=post_norm,
        )

    return _spmd_wrap(fn, lambda b_ax: fn, batched=(0, 10, 11),
                      n_out_batched=1, rule=_ATTN_FWD_RULE)


@functools.lru_cache(maxsize=None)
def _attn_bwd_sharded(scale, n_heads, lam, has_bias, has_ls,
                      post_norm=False, has_mask=True):
    def fn(x, lng, lnb, wqkv, bqkv, bias_arg, ids, wproj, bproj, gamma_arg,
           gb, do):
        return _attn_half_bwd_arrays(
            x, lng, lnb, wqkv, bqkv, bias_arg, ids, wproj, bproj,
            gamma_arg, gb, do, scale, n_heads, lam, has_bias, has_ls,
            post_norm, has_mask,
        )

    def make_lower(b_ax):
        def lower(*args):
            dx, *pgrads = fn(*args)
            if b_ax is not None:
                pgrads = [jax.lax.psum(g, b_ax) for g in pgrads]
            return (dx, *pgrads)

        return lower

    return _spmd_wrap(fn, make_lower, batched=(0, 10, 11),
                      n_out_batched=1, rule=_ATTN_BWD_RULE)


@functools.lru_cache(maxsize=None)
def _mlp_fwd_sharded(tile, lam, has_ls, post_norm=False):
    def fn(x, lng, lnb, w1, b1, w2, b2, gamma_arg, gf, gb):
        return _ln_mlp_fwd(x, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam,
                           gamma=gamma_arg if has_ls else None,
                           post_norm=post_norm)

    return _spmd_wrap(fn, lambda b_ax: fn, batched=(0, 8, 9),
                      n_out_batched=1, rule=_MLP_FWD_RULE)


@functools.lru_cache(maxsize=None)
def _mlp_bwd_sharded(tile, lam, has_ls, post_norm=False):
    def fn(x, lng, lnb, w1, b1, w2, b2, gamma_arg, gb, do):
        return _ln_mlp_bwd_arrays(x, lng, lnb, w1, b1, w2, b2, gamma_arg,
                                  gb, do, tile, lam, has_ls, post_norm)

    def make_lower(b_ax):
        def lower(*args):
            dx, *pgrads = fn(*args)
            if b_ax is not None:
                pgrads = [jax.lax.psum(g, b_ax) for g in pgrads]
            return (dx, *pgrads)

        return lower

    return _spmd_wrap(fn, make_lower, batched=(0, 8, 9),
                      n_out_batched=1, rule=_MLP_BWD_RULE)


def _attn_half_fwd_dispatch(x, lng, lnb, wqkv, bqkv, bias, ids, wproj,
                            bproj, gf, gb, gamma, scale, n_heads, lam,
                            post_norm):
    has_ls = gamma is not None
    has_mask = ids is not None
    if len(jax.devices()) > 1:
        has_bias = bias is not None
        bias_arg = bias if has_bias else jnp.zeros((1, 1, 1), jnp.float32)
        c = x.shape[-1]
        gamma_arg = gamma if has_ls else jnp.zeros((c,), jnp.float32)
        ids_arg = (ids if has_mask
                   else jnp.zeros((1, x.shape[1]), jnp.int32))
        fn = _attn_fwd_sharded(scale, n_heads, lam, has_bias, has_ls,
                               post_norm, has_mask)
        return fn(x, lng, lnb, wqkv, bqkv, bias_arg, ids_arg, wproj, bproj,
                  gamma_arg, gf.reshape(-1), gb.reshape(-1))
    return _attn_half_fwd(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                          gf, gb, scale, n_heads, lam, gamma=gamma,
                          post_norm=post_norm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 15))
def fused_attn_half(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                    gf, gb, scale, n_heads, lam, gamma=None,
                    post_norm=False):
    """lam * x + gf[s] * (gamma (*)) proj(window_attention(qkv(LN(x)))).

    Args:
        x: [BW, N, C] raw (pre-norm) window tokens, bf16 or f32.
        lng, lnb: [C] f32 LayerNorm scale/bias (epsilon 1e-5).
        wqkv: [C, 3C] f32; bqkv: [3C] f32 (zeros when QKV_BIAS is off).
        bias: [H, N, N] f32 relative-position bias, or None (no bias term
            and no dbias output — full-sequence ViT attention).
        ids: [W, N] int32 region ids (program bw uses row bw % W), or None
            for statically maskless attention (unshifted blocks / ViT) —
            skips the mask build + per-head adds (several [N, N] VPU
            passes per program, fwd and bwd recompute).
        wproj: [C, C] f32; bproj: [C] f32.
        gf, gb: [B] f32 per-SAMPLE forward/backward branch gains
            (DropPath / ShakeDrop / stable-beta absorbed; RNG-driven,
            treated as constants by the VJP); window bw uses entry
            bw // (BW // B).
        scale, n_heads, lam: static (lam = stable residual x-gain, 1.0
            otherwise; lam = 0.0 yields the bare branch output).
        gamma: optional [C] f32 learnable LayerScale applied to the branch
            BEFORE the gains (reference ResidualBranch order); None = off.
        post_norm: static — norm1 moves from the block input to the branch
            output (reference post-norm variant).
    Returns: [BW, N, C] in x.dtype.
    """
    return _attn_half_fwd_dispatch(x, lng, lnb, wqkv, bqkv, bias, ids,
                                   wproj, bproj, gf, gb, gamma,
                                   scale, n_heads, lam, post_norm)


def _attn_half_vjp_fwd(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                       gf, gb, scale, n_heads, lam, gamma=None,
                       post_norm=False):
    out = _attn_half_fwd_dispatch(x, lng, lnb, wqkv, bqkv, bias, ids,
                                  wproj, bproj, gf, gb, gamma,
                                  scale, n_heads, lam, post_norm)
    return out, (x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj, gf, gb,
                 gamma)


fused_attn_half.defvjp(_attn_half_vjp_fwd, _attn_half_bwd)


# ---------------------------------------------------------------------------
# fused LN + MLP half + residual on flat token tiles
# ---------------------------------------------------------------------------

def _mlp_fwd_kernel(gf_ref, x_ref, lng_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, gamma_ref, out_ref, *, lam, tiles_per_sample,
                    has_ls, post_norm):
    cdt = _mm_dtype(x_ref.dtype)
    x = x_ref[...].astype(jnp.float32)                      # [T, C]
    if post_norm:
        y = x
    else:
        y, _, _ = _ln_fwd(x, lng_ref[0], lnb_ref[0])
    h1 = jax.lax.dot_general(
        y.astype(cdt), w1_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h = _gelu_exact(h1)
    branch = jax.lax.dot_general(
        h.astype(cdt), w2_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if post_norm:
        branch, _, _ = _ln_fwd(branch, lng_ref[0], lnb_ref[0])
    if has_ls:
        branch = branch * gamma_ref[0]
    gf = gf_ref[pl.program_id(0) // tiles_per_sample, 0]
    out = lam * x + gf * branch
    out_ref[...] = out.astype(out_ref.dtype)


def _mlp_bwd_kernel(gb_ref, x_ref, lng_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, gamma_ref, do_ref,
                    dx_ref, dlng_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, dgamma_ref, *, lam, tiles_per_sample, has_ls,
                    post_norm):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dlng_ref[...] = jnp.zeros_like(dlng_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)

    cdt = _mm_dtype(x_ref.dtype)
    x = x_ref[...].astype(jnp.float32)
    lng = lng_ref[0]
    if post_norm:
        y, xhat, rstd = x, None, None
    else:
        y, xhat, rstd = _ln_fwd(x, lng, lnb_ref[0])
    h1 = jax.lax.dot_general(
        y.astype(cdt), w1_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h = _gelu_exact(h1)

    do_res = do_ref[...].astype(jnp.float32)
    do = gb_ref[pl.program_id(0) // tiles_per_sample, 0] * do_res
    if post_norm:
        # branch -> LN2 -> [gamma] -> gains (see the attn bwd kernel)
        branch = jax.lax.dot_general(
            h.astype(cdt), w2_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0]
        bn, bn_xhat, bn_rstd = _ln_fwd(branch, lng, lnb_ref[0])
        if has_ls:
            dgamma_ref[0] += jnp.sum(do * bn, axis=0)
            do = do * gamma_ref[0]
        dbranch, dg_pn, db_pn = _ln_bwd(do, lng, bn_xhat, bn_rstd)
        dlng_ref[0] += dg_pn
        dlnb_ref[0] += db_pn
        dw2_ref[...] += jax.lax.dot_general(
            h.astype(cdt), dbranch.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2_ref[0] += jnp.sum(dbranch, axis=0)
        do = dbranch
    else:
        # LayerScale (see the attn bwd kernel): with M = h^T @ do and
        # s = sum(do), dw2 = M (*) gamma, db2 = s (*) gamma and
        # dgamma = colsum(w2 (*) M) + b2 (*) s — no branch recompute.
        fc2_m = jax.lax.dot_general(
            h.astype(cdt), do.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        fc2_s = jnp.sum(do, axis=0)
        if has_ls:
            gamma = gamma_ref[0]
            dgamma_ref[0] += (jnp.sum(w2_ref[...] * fc2_m, axis=0)
                              + b2_ref[0, :] * fc2_s)
            dw2_ref[...] += fc2_m * gamma
            db2_ref[0] += fc2_s * gamma
            do = do * gamma
        else:
            dw2_ref[...] += fc2_m
            db2_ref[0] += fc2_s
    dh = jax.lax.dot_general(
        do.astype(cdt), w2_ref[...].astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh1 = dh * _gelu_grad(h1)
    dw1_ref[...] += jax.lax.dot_general(
        y.astype(cdt), dh1.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[0] += jnp.sum(dh1, axis=0)
    dy = jax.lax.dot_general(
        dh1.astype(cdt), w1_ref[...].astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if post_norm:
        dx = dy
    else:
        dx, dg, db = _ln_bwd(dy, lng, xhat, rstd)
        dlng_ref[0] += dg
        dlnb_ref[0] += db
    dx_ref[...] = (lam * do_res + dx).astype(dx_ref.dtype)


def mlp_tile_rows(t: int, cap: int = 512) -> int:
    """Largest multiple of 8 that divides ``t`` and is <= cap (0 if none)."""
    best = 0
    for cand in range(8, cap + 1, 8):
        if t % cand == 0:
            best = cand
    return best


def mlp_tiling(rows: int, c: int, hid: int) -> tuple[int, int]:
    """(tile, pad_rows) for the fused LN+MLP kernel over per-sample ``rows``.

    Searches per-sample paddings (multiples of 8, up to +256 rows) and
    divisor tiles under the VMEM budget, minimizing a padded-compute +
    program-overhead cost (a program launch is worth ~64 rows of MLP
    compute) — program overhead dominated the kernel at the old 512-row
    cap (stage-1 Swin-T: 864 programs of 504 rows; ~3k-row tiles cut that
    6x), while an unpenalized max-tile search pads small stages by up to
    170%. Returns (0, 0) when no padding yields a feasible tile."""
    overhead_rows = 64
    best, best_cost = (0, 0), None
    base = -(-rows // 8) * 8
    for rows_p in range(base, base + 257, 8):
        for cand in range(8, min(rows_p, 8192) + 1, 8):
            # cap live activations at ~40 MB (8 tile x hid f32 temporaries),
            # leaving pipelining headroom under the 100 MB scoped limit
            if (rows_p % cand == 0 and 32 * cand * hid <= 40 * 1024 * 1024
                    and ln_mlp_vmem_ok(c, hid, cand)):
                cost = rows_p + overhead_rows * (rows_p // cand)
                if best_cost is None or cost < best_cost:
                    best, best_cost = (cand, rows_p - rows), cost
    return best


def _mlp_specs(tile, c, hid, nsamp):
    blk = lambda shape: pl.BlockSpec(
        shape, lambda ti: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec((tile, c), lambda ti: (ti, 0),
                          memory_space=pltpu.VMEM)
    gain_spec = pl.BlockSpec((nsamp, 1), lambda ti: (0, 0),
                             memory_space=pltpu.SMEM)
    return dict(
        x=x_spec, gain=gain_spec, lnv=blk((1, c)), w1=blk((c, hid)),
        b1=blk((1, hid)), w2=blk((hid, c)), b2=blk((1, c)),
    )


def _ln_mlp_fwd(x, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam, gamma=None,
                post_norm=False):
    t, c = x.shape
    hid = w1.shape[1]
    nsamp = gf.shape[0]
    has_ls = gamma is not None
    gamma_arg = gamma if has_ls else jnp.zeros((c,), jnp.float32)
    tiles_per_sample = (t // nsamp) // tile
    sp = _mlp_specs(tile, c, hid, nsamp)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, lam=lam,
                          tiles_per_sample=tiles_per_sample, has_ls=has_ls,
                          post_norm=post_norm),
        grid=(t // tile,),
        in_specs=[sp["gain"], sp["x"], sp["lnv"], sp["lnv"], sp["w1"],
                  sp["b1"], sp["w2"], sp["b2"], sp["lnv"]],
        out_specs=sp["x"],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(gf.reshape(nsamp, 1), x, lng.reshape(1, c), lnb.reshape(1, c), w1,
      b1.reshape(1, hid), w2, b2.reshape(1, c), gamma_arg.reshape(1, c))


def _ln_mlp_bwd_arrays(x, lng, lnb, w1, b1, w2, b2, gamma_arg, gb, do,
                       tile, lam, has_ls, post_norm):
    """Backward pallas call on concrete arrays; returns the 8 grad arrays
    (dx, dlng, dlnb, dw1, db1, dw2, db2, dgamma)."""
    t, c = x.shape
    hid = w1.shape[1]
    nsamp = gb.shape[0]
    tiles_per_sample = (t // nsamp) // tile
    sp = _mlp_specs(tile, c, hid, nsamp)
    f32 = jnp.float32
    dx, dlng, dlnb, dw1, db1, dw2, db2, dgamma = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, lam=lam,
                          tiles_per_sample=tiles_per_sample, has_ls=has_ls,
                          post_norm=post_norm),
        grid=(t // tile,),
        in_specs=[sp["gain"], sp["x"], sp["lnv"], sp["lnv"], sp["w1"],
                  sp["b1"], sp["w2"], sp["b2"], sp["lnv"], sp["x"]],
        out_specs=(sp["x"], sp["lnv"], sp["lnv"], sp["w1"], sp["b1"],
                   sp["w2"], sp["b2"], sp["lnv"]),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        compiler_params=_CPARAMS,
        interpret=not _wa._on_tpu(),
    )(gb.reshape(nsamp, 1), x, lng.reshape(1, c), lnb.reshape(1, c), w1,
      b1.reshape(1, hid), w2, b2.reshape(1, c), gamma_arg.reshape(1, c), do)
    return (dx, dlng.reshape(c), dlnb.reshape(c), dw1, db1.reshape(hid),
            dw2, db2.reshape(c), dgamma.reshape(c))


def _ln_mlp_bwd(tile, lam, post_norm, res, do):
    x, lng, lnb, w1, b1, w2, b2, gf, gb, gamma = res
    has_ls = gamma is not None
    gamma_arg = (gamma if has_ls
                 else jnp.zeros((x.shape[-1],), jnp.float32))
    if len(jax.devices()) > 1:
        fn = _mlp_bwd_sharded(tile, lam, has_ls, post_norm)
        grads = fn(x, lng, lnb, w1, b1, w2, b2, gamma_arg,
                   gb.reshape(-1), do)
    else:
        grads = _ln_mlp_bwd_arrays(x, lng, lnb, w1, b1, w2, b2, gamma_arg,
                                   gb.reshape(-1), do, tile, lam, has_ls,
                                   post_norm)
    *main, dgamma = grads
    return (*main, jnp.zeros_like(gf), jnp.zeros_like(gb),
            dgamma if has_ls else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 12))
def fused_ln_mlp(x, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam,
                 gamma=None, post_norm=False):
    """lam * x + gf[s] * (gamma (*)) fc2(gelu_exact(fc1(LN(x)))), tiled.

    Args:
        x: [T, C] tokens, T divisible by ``tile`` and by len(gf), with
            tile dividing the per-sample row count (rows are
            sample-major, so each tile belongs to one sample).
        lng, lnb: [C] f32 LayerNorm scale/bias.
        w1: [C, HID]; b1: [HID]; w2: [HID, C]; b2: [C] (f32).
        gf, gb: [B] f32 per-sample forward/backward branch gains.
        tile: static row-tile size (use ``mlp_tiling`` — it returns a tile
            that divides the PER-SAMPLE row count; ``mlp_tile_rows`` only
            divides the total T and violates the contract below for B > 1).
        lam: static residual x-gain (0.0 yields the bare branch).
        gamma: optional [C] f32 LayerScale on the branch (before gains).
        post_norm: static — norm2 moves from the block input to the branch
            output (reference post-norm variant).
    Returns: [T, C] in x.dtype.
    """
    t, nsamp = x.shape[0], gf.shape[0]
    # The kernels index the per-sample gain as gf[program_id // tiles_per_
    # sample]: every tile must lie inside ONE sample (rows are sample-
    # major). A tile that spans samples applies the wrong sample's
    # DropPath/ShakeDrop gain; tile > rows-per-sample divides by zero.
    if t % nsamp != 0 or tile <= 0 or (t // nsamp) % tile != 0:
        raise ValueError(
            f"fused_ln_mlp: tile={tile} must divide the per-sample row "
            f"count {t}//{nsamp} (use mlp_tiling, not mlp_tile_rows)")
    return _ln_mlp_fwd_dispatch(x, lng, lnb, w1, b1, w2, b2, gf, gb,
                                gamma, tile, lam, post_norm)


def _ln_mlp_fwd_dispatch(x, lng, lnb, w1, b1, w2, b2, gf, gb, gamma,
                         tile, lam, post_norm):
    has_ls = gamma is not None
    if len(jax.devices()) > 1:
        gamma_arg = (gamma if has_ls
                     else jnp.zeros((x.shape[-1],), jnp.float32))
        fn = _mlp_fwd_sharded(tile, lam, has_ls, post_norm)
        return fn(x, lng, lnb, w1, b1, w2, b2, gamma_arg, gf.reshape(-1),
                  gb.reshape(-1))
    return _ln_mlp_fwd(x, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam,
                       gamma=gamma, post_norm=post_norm)


def _ln_mlp_vjp_fwd(x, lng, lnb, w1, b1, w2, b2, gf, gb, tile, lam,
                    gamma=None, post_norm=False):
    return (_ln_mlp_fwd_dispatch(x, lng, lnb, w1, b1, w2, b2, gf, gb,
                                 gamma, tile, lam, post_norm),
            (x, lng, lnb, w1, b1, w2, b2, gf, gb, gamma))


fused_ln_mlp.defvjp(_ln_mlp_vjp_fwd, _ln_mlp_bwd)


# ---------------------------------------------------------------------------
# gating
# ---------------------------------------------------------------------------

def attn_half_vmem_ok(c: int, n: int, n_heads: int, wb: int = 1,
                      with_bias: bool = True) -> bool:
    """Conservative VMEM budget for the fused attention-half backward."""
    weights = 2 * 4 * (c * 3 * c + c * c)          # wqkv/wproj + grads, f32
    bias = 2 * 4 * n_heads * n * n if with_bias else 0   # bias + dbias
    acts = 10 * 4 * wb * n * 3 * c                 # qkv/dqkv/x/y/do headroom
    masks = 4 * wb * n * n                         # per-slot additive masks
    return weights + bias + acts + masks < 70 * 1024 * 1024


def ln_mlp_vmem_ok(c: int, hid: int, tile: int) -> bool:
    weights = 2 * 4 * (2 * c * hid)
    acts = 8 * 4 * tile * hid
    return weights + acts < 80 * 1024 * 1024
