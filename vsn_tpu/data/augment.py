"""On-device data augmentation (jitted, batched, RNG-keyed).

The reference runs MONAI transforms on CPU in DataLoader workers
(train/train_transformer.py:1656-1752). Here the augmentation stacks are pure
JAX functions over a batch [B, D, H, W, C] that fuse into the train step —
the host only ships raw float16 cache tensors, and geometry/intensity work
runs on the TPU's VPU/MXU. Parameter distributions match the reference stacks:

  * minimal (default): resize + z-score normalize (1729-1752);
  * "dung" stack: RandAffine(rot ±0.05 rad, scale ±0.1, zeros padding, p=1) ->
    OneOf{identity 0.3, random crop (132,154,132) 0.7} -> resize -> sagittal
    flip p=0.5 -> normalize (1659-1687);
  * extended: affine(±30°, scale ±0.3, translate ±10, border, p=.5), elastic,
    Rician/Gaussian noise, bias field, gamma contrast, intensity scale,
    histogram shift, k-space spike, Gibbs — each with the reference's
    probabilities (1688-1728).

Exact RNG parity with MONAI is a non-goal; distributions are matched.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Intensity
# ---------------------------------------------------------------------------

def zscore(x: jax.Array) -> jax.Array:
    """Per-sample z-score over the whole volume (MONAI NormalizeIntensity
    defaults: nonzero=False, channel_wise=False)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = x32.mean(axis=axes, keepdims=True)
    std = x32.std(axis=axes, keepdims=True)
    return (x32 - mean) / jnp.maximum(std, 1e-8)


def _minmax_unit(x):
    axes = tuple(range(1, x.ndim))
    lo = x.min(axis=axes, keepdims=True)
    hi = x.max(axis=axes, keepdims=True)
    rng = jnp.maximum(hi - lo, 1e-8)
    return (x - lo) / rng, lo, rng


def gaussian_noise(x, key, prob: float, noise_factor: float = 0.1):
    """AdaptiveGaussianNoise (reference utils/transforms.py:6-31): add N(0, f)
    in temporarily min-max-normalized space, then rescale back."""
    b = x.shape[0]
    k_apply, k_noise = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    u, lo, rng = _minmax_unit(x.astype(jnp.float32))
    noisy = u + noise_factor * jax.random.normal(k_noise, x.shape)
    out = noisy * rng + lo
    return jnp.where(apply, out, x.astype(jnp.float32))


def rician_noise(x, key, prob: float, noise_factor: float = 0.1):
    """AdaptiveRicianNoise (utils/transforms.py:34-66): v' = sqrt((v+n1)^2 + n2^2)
    in min-max space."""
    b = x.shape[0]
    k_apply, k1, k2 = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    u, lo, rng = _minmax_unit(x.astype(jnp.float32))
    n1 = noise_factor * jax.random.normal(k1, x.shape)
    n2 = noise_factor * jax.random.normal(k2, x.shape)
    noisy = jnp.sqrt(jnp.square(u + n1) + jnp.square(n2))
    out = noisy * rng + lo
    return jnp.where(apply, out, x.astype(jnp.float32))


def random_scale_intensity(x, key, prob: float, factors=(-0.5, 1.0)):
    """MONAI RandScaleIntensity: x * (1 + U(factors))."""
    b = x.shape[0]
    k_apply, k_f = jax.random.split(key)
    shape = (b,) + (1,) * (x.ndim - 1)
    apply = jax.random.bernoulli(k_apply, prob, shape)
    f = jax.random.uniform(k_f, shape, minval=factors[0], maxval=factors[1])
    return jnp.where(apply, x * (1.0 + f), x)


def random_adjust_contrast(x, key, prob: float, gamma=(0.7, 1.5)):
    """MONAI RandAdjustContrast: gamma correction in min-max space."""
    b = x.shape[0]
    k_apply, k_g = jax.random.split(key)
    shape = (b,) + (1,) * (x.ndim - 1)
    apply = jax.random.bernoulli(k_apply, prob, shape)
    g = jax.random.uniform(k_g, shape, minval=gamma[0], maxval=gamma[1])
    u, lo, rng = _minmax_unit(x.astype(jnp.float32))
    out = jnp.power(jnp.maximum(u, 0.0), g) * rng + lo
    return jnp.where(apply, out, x.astype(jnp.float32))


def random_bias_field(x, key, prob: float, coeff_range=(0.0, 0.1), degree: int = 3):
    """MONAI RandBiasField: multiply by exp(polynomial field) with random
    coefficients over normalized coordinates."""
    b, d, h, w = x.shape[:4]
    k_apply, k_c = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    # polynomial basis over [-1, 1]^3 up to total degree
    zs = jnp.linspace(-1, 1, d)
    ys = jnp.linspace(-1, 1, h)
    xs = jnp.linspace(-1, 1, w)
    terms = []
    for i in range(degree + 1):
        for j in range(degree + 1 - i):
            for k in range(degree + 1 - i - j):
                terms.append(
                    (zs[:, None, None] ** i) * (ys[None, :, None] ** j)
                    * (xs[None, None, :] ** k)
                )
    basis = jnp.stack(terms)  # [T, D, H, W]
    coeff = jax.random.uniform(
        k_c, (b, basis.shape[0]), minval=coeff_range[0], maxval=coeff_range[1]
    )
    field = jnp.exp(jnp.einsum("bt,tdhw->bdhw", coeff, basis))[..., None]
    return jnp.where(apply, x * field, x)


def gibbs_noise(x, key, prob: float, alpha=(0.5, 1.0)):
    """MONAI RandGibbsNoise: radial low-pass filter in k-space with strength
    alpha (fraction of spectrum zeroed from the outside in)."""
    b, d, h, w = x.shape[:4]
    k_apply, k_a = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    a = jax.random.uniform(k_a, (b, 1, 1, 1), minval=alpha[0], maxval=alpha[1])
    x32 = x.astype(jnp.float32).squeeze(-1)  # [B, D, H, W]
    spec = jnp.fft.fftshift(jnp.fft.fftn(x32, axes=(1, 2, 3)), axes=(1, 2, 3))
    zz = jnp.abs(jnp.arange(d) - d // 2) / max(d // 2, 1)
    yy = jnp.abs(jnp.arange(h) - h // 2) / max(h // 2, 1)
    xx = jnp.abs(jnp.arange(w) - w // 2) / max(w // 2, 1)
    r = jnp.sqrt(
        zz[:, None, None] ** 2 + yy[None, :, None] ** 2 + xx[None, None, :] ** 2
    ) / jnp.sqrt(3.0)
    keep = (r[None] <= (1.0 - a)).astype(spec.dtype)
    filtered = jnp.fft.ifftn(
        jnp.fft.ifftshift(spec * keep, axes=(1, 2, 3)), axes=(1, 2, 3)
    ).real[..., None]
    return jnp.where(apply, filtered, x.astype(jnp.float32))


def kspace_spike_noise(x, key, prob: float, intensity_range=(13.0, 15.0)):
    """MONAI RandKSpaceSpikeNoise: set one random k-space point's log-modulus."""
    b, d, h, w = x.shape[:4]
    k_apply, k_loc, k_int = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    x32 = x.astype(jnp.float32).squeeze(-1)
    spec = jnp.fft.fftshift(jnp.fft.fftn(x32, axes=(1, 2, 3)), axes=(1, 2, 3))
    # random voxel in the central half of k-space, per sample
    locs = jnp.stack(
        [
            jax.random.randint(jax.random.fold_in(k_loc, i), (b,), s // 4, 3 * s // 4)
            for i, s in enumerate((d, h, w))
        ],
        axis=-1,
    )
    inten = jax.random.uniform(
        k_int, (b,), minval=intensity_range[0], maxval=intensity_range[1]
    )

    def spike_one(sp, loc, it):
        val = jnp.exp(it) * jnp.exp(1j * jnp.angle(sp[loc[0], loc[1], loc[2]]))
        return sp.at[loc[0], loc[1], loc[2]].set(val)

    spiked = jax.vmap(spike_one)(spec, locs, inten)
    out = jnp.fft.ifftn(
        jnp.fft.ifftshift(spiked, axes=(1, 2, 3)), axes=(1, 2, 3)
    ).real[..., None]
    return jnp.where(apply, out, x.astype(jnp.float32))


def random_histogram_shift(x, key, prob: float, num_control_points=(5, 15)):
    """MONAI RandHistogramShift: random monotone piecewise-linear remap of the
    min-max-normalized intensities. Uses the max control-point count with
    interior points jittered (static shapes under jit)."""
    b = x.shape[0]
    ncp = int(num_control_points[1])
    k_apply, k_cp = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, prob, (b,) + (1,) * (x.ndim - 1))
    ref = jnp.linspace(0.0, 1.0, ncp)
    jitter = jax.random.uniform(k_cp, (b, ncp), minval=0.0, maxval=1.0)
    # monotone random control values: sorted uniform with pinned endpoints
    cv = jnp.sort(jitter, axis=1)
    cv = (cv - cv[:, :1]) / jnp.maximum(cv[:, -1:] - cv[:, :1], 1e-8)
    u, lo, rng = _minmax_unit(x.astype(jnp.float32))

    def remap(ui, cvi):
        return jnp.interp(ui.reshape(-1), ref, cvi).reshape(ui.shape)

    out = jax.vmap(remap)(u, cv) * rng + lo
    return jnp.where(apply, out, x.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def resize_batch(x: jax.Array, target) -> jax.Array:
    """Trilinear resize of the spatial dims of [B, D, H, W, C]."""
    b, _, _, _, c = x.shape
    if tuple(x.shape[1:4]) == tuple(target):
        return x
    return jax.image.resize(
        x.astype(jnp.float32), (b, *target, c), method="linear"
    )


def random_flip(x: jax.Array, key, prob: float = 0.5, axis: int = 1) -> jax.Array:
    """Per-sample flip along one spatial axis (sagittal = first spatial dim,
    matching RandFlip(spatial_axis=0) at reference 1686/1725)."""
    b = x.shape[0]
    shape = (b,) + (1,) * (x.ndim - 1)
    apply = jax.random.bernoulli(key, prob, shape)
    return jnp.where(apply, jnp.flip(x, axis=axis), x)


def _rotation_matrix(angles):
    az, ay, ax = angles[0], angles[1], angles[2]
    cz, sz = jnp.cos(az), jnp.sin(az)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    rz = jnp.array([[1, 0, 0], [0, cz, -sz], [0, sz, cz]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = jnp.array([[cx, -sx, 0], [sx, cx, 0], [0, 0, 1]])
    return rz @ ry @ rx


def affine_warp(
    vol: jax.Array,  # [D, H, W]
    angles: jax.Array,  # [3] radians
    scales: jax.Array,  # [3] multiplicative
    translation: jax.Array,  # [3] voxels
    mode: str = "zeros",
) -> jax.Array:
    """Trilinear affine resample about the volume center.

    Output voxel p maps to input coordinate  M^{-1} (p - c - t) + c  with
    M = R(angles) @ diag(scales).
    """
    d, h, w = vol.shape
    m = _rotation_matrix(angles) * scales[None, :]
    minv = jnp.linalg.inv(m)
    center = jnp.array([(d - 1) / 2, (h - 1) / 2, (w - 1) / 2])
    grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(d, dtype=jnp.float32),
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=0,
    )  # [3, D, H, W]
    rel = grid.reshape(3, -1) - (center + translation)[:, None]
    src = minv @ rel + center[:, None]
    scipy_mode = "constant" if mode == "zeros" else "nearest"
    out = jax.scipy.ndimage.map_coordinates(
        vol.astype(jnp.float32), list(src), order=1, mode=scipy_mode, cval=0.0
    )
    return out.reshape(d, h, w)


# --- matmul-based affine resampling (no gathers) ---------------------------
#
# jax.scipy.ndimage.map_coordinates lowers to 8-neighbor gathers, which are
# catastrophically slow on TPU (~450 ms per 144^3 volume even axis-aligned).
# Instead we decompose the inverse affine A = L U (Doolittle, 3x3 closed
# form) into EIGHT single-axis resample passes, each "resample axis t at
# src = scale*i + slope*dep + shift" — expressed as an einsum against a
# banded trilinear weight tensor built from iota (pure elementwise + MXU
# matmul, zero gathers). Coordinate maps compose exactly; only interpolation
# smoothing differs slightly from direct trilinear sampling.

def _lu3(a: jax.Array):
    """Closed-form Doolittle LU of a [3,3] matrix (unit lower diag)."""
    u11, u12, u13 = a[0, 0], a[0, 1], a[0, 2]
    l21 = a[1, 0] / u11
    u22 = a[1, 1] - l21 * u12
    u23 = a[1, 2] - l21 * u13
    l31 = a[2, 0] / u11
    l32 = (a[2, 1] - l31 * u12) / u22
    u33 = a[2, 2] - l31 * u13 - l32 * u23
    lower = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    lower = lower.at[1, 0].set(l21).at[2, 0].set(l31).at[2, 1].set(l32)
    upper = jnp.zeros((3, 3)).at[0, 0].set(u11).at[0, 1].set(u12).at[
        0, 2].set(u13).at[1, 1].set(u22).at[1, 2].set(u23).at[2, 2].set(u33)
    return lower, upper


def _resample_pass(x, axis, dep_axis, scale, slope, shift, mode):
    """out[..., i@axis, ...] = lerp of x along ``axis`` at
    src = scale*i + slope*dep + shift (per-sample scalars [B]).

    Weight tensor W[b, dep, i, k] = max(0, 1 - |src - k|); out-of-range
    source weights vanish (zero padding). mode='border' clamps src instead.
    Contraction runs on the MXU via einsum.
    """
    size = x.shape[axis]
    i = jnp.arange(size, dtype=jnp.float32)
    if dep_axis is None:
        src = scale[:, None] * i[None, :] + shift[:, None]      # [B, I]
        src = src[:, None, :]                                    # dep dim 1
        dep_size = 1
    else:
        dep = jnp.arange(x.shape[dep_axis], dtype=jnp.float32)
        src = (scale[:, None, None] * i[None, None, :]
               + slope[:, None, None] * dep[None, :, None]
               + shift[:, None, None])                           # [B, DEP, I]
        dep_size = x.shape[dep_axis]
    if mode == "border":
        src = jnp.clip(src, 0.0, size - 1)
    k = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - k))     # [B,DEP,I,K]

    # einsum subscripts: axes of x are (b, 1, 2, 3); name them.
    names = {1: "z", 2: "y", 3: "x"}
    tgt = names[axis]
    in_sub = "b" + "".join(
        "k" if a == axis else names[a] for a in (1, 2, 3)
    )
    out_sub = "b" + "".join(names[a] for a in (1, 2, 3))
    dep_name = names[dep_axis] if dep_axis is not None else "q"
    w_sub = f"b{dep_name}{tgt}k"
    if dep_axis is None:
        w = w[:, 0]  # [B, I, K]
        w_sub = f"b{tgt}k"
    return jnp.einsum(
        f"{w_sub},{in_sub}->{out_sub}", w, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def affine_warp_matmul(
    vols: jax.Array,   # [B, D, H, W]
    angles: jax.Array,  # [B, 3]
    scales: jax.Array,  # [B, 3]
    translation: jax.Array,  # [B, 3] voxels
    mode: str = "zeros",
) -> jax.Array:
    """Batched affine warp equivalent to vmap(affine_warp) without gathers.

    Output voxel p samples input at A (p - c - t) + c with A = M^{-1},
    M = R(angles) diag(scales). A = L U; the warp is applied as the L-pass
    stack first, then the U-pass stack (composition order: the last-applied
    pass's coordinates are evaluated first), each pass a single-axis
    banded-matmul resample.
    """
    b = vols.shape[0]
    d, h, w = vols.shape[1:]
    center = jnp.array([(d - 1) / 2, (h - 1) / 2, (w - 1) / 2])

    def params(angle, scale, trans):
        m = _rotation_matrix(angle) * scale[None, :]
        a = jnp.linalg.inv(m)
        lower, upper = _lu3(a)
        # src = A p + o with o = c - A(c + t)
        o = center - a @ (center + trans)
        return lower, upper, o

    lower, upper, o = jax.vmap(params)(angles, scales, translation)
    zero = jnp.zeros((b,))
    one = jnp.ones((b,))

    # inner map (applied to the input first): g(w) = in(L w + o)
    #   z: w_z + o_z ; y: l21 w_z + w_y + o_y ; x: l31 w_z + l32 w_y + w_x + o_x
    x_ = _resample_pass(vols, 1, None, one, zero, o[:, 0], mode)
    x_ = _resample_pass(x_, 2, 1, one, lower[:, 1, 0], o[:, 1], mode)
    x_ = _resample_pass(x_, 3, 1, one, lower[:, 2, 0], o[:, 2], mode)
    x_ = _resample_pass(x_, 3, 2, one, lower[:, 2, 1], zero, mode)
    # outer map: out(p) = g(U p)
    #   x: u33 x ; y: u22 y + u23 x ; z: u11 z + u12 y + u13 x
    # Application order φx, φy, ζ2, ζ1 yields composite φx∘φy∘ζ2∘ζ1 (the
    # LAST-applied pass's coordinates are evaluated first on p): ζ1 makes
    # z = u11 z + u12 y from originals, ζ2 then adds u13 x (original x,
    # unscaled by u11), φy/φx see original x.
    x_ = _resample_pass(x_, 3, None, upper[:, 2, 2], zero, zero, mode)
    x_ = _resample_pass(x_, 2, 3, upper[:, 1, 1], upper[:, 1, 2], zero, mode)
    x_ = _resample_pass(x_, 1, 3, one, upper[:, 0, 2], zero, mode)
    x_ = _resample_pass(x_, 1, 2, upper[:, 0, 0], upper[:, 0, 1], zero, mode)
    return x_


def displacement_warp_axis(
    x: jax.Array,      # [B, D, H, W]
    disp: jax.Array,   # [B, D, H, W] per-voxel source offsets along ``axis``
    axis: int,
    max_disp: int,
) -> jax.Array:
    """out[i] = linear sample of x at i + disp[i] along ``axis``, gather-free.

    Displacements are clamped to the static band [-K, K] and the linear
    interpolation is evaluated as a (2K+1)-tap weighted sum of edge-clamped
    axis shifts: out = sum_o relu(1 - |disp - o|) * shift_o(x). Each tap is a
    static slice of the padded volume, so XLA fuses the whole thing into one
    VPU loop — no gathers (~450 ms/volume on TPU) anywhere.
    """
    k = int(max_disp)
    d = jnp.clip(disp, -k, k)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, k)
    xp = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    out = jnp.zeros(x.shape, jnp.float32)
    for o in range(-k, k + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k + o, k + o + n)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d - o))
        out = out + w * xp[tuple(sl)].astype(jnp.float32)
    return out


def displacement_warp(vols: jax.Array, disp: jax.Array, max_disp: int):
    """Separable 3-axis displacement warp: [B,D,H,W] x [B,D,H,W,3] -> warped.

    Sequential single-axis passes (z, then y, then x) compose the vector
    field, the form that runs at VPU speed on TPU (no gathers).

    KNOWN REFERENCE DEVIATION (documented in STATUS.md): the reference's
    Rand3DElastic (MONAI) jointly trilinearly resamples the 3D vector field;
    sequential axis passes only approximate joint sampling for real 3D
    fields (exact when displacement varies along a single axis). For the
    smooth, small-amplitude fields this augmentation draws, the approximation
    error is bounded well below the augmentation noise itself —
    tests/test_augment_mixers.py::test_separable_warp_close_to_joint_trilinear
    measures it against scipy.ndimage.map_coordinates.
    """
    out = displacement_warp_axis(vols, disp[..., 0], 1, max_disp)
    out = displacement_warp_axis(out, disp[..., 1], 2, max_disp)
    return displacement_warp_axis(out, disp[..., 2], 3, max_disp)


def random_affine(
    x: jax.Array,
    key,
    prob: float,
    rotate_range: float,
    scale_range: float,
    translate_range: float = 0.0,
    mode: str = "zeros",
) -> jax.Array:
    """Per-sample random affine: rot ~ U(±rotate_range) per axis (radians),
    scale ~ 1 + U(±scale_range), translate ~ U(±translate_range) voxels."""
    b = x.shape[0]
    k_apply, k_rot, k_scale, k_tr = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    angles = jax.random.uniform(
        k_rot, (b, 3), minval=-rotate_range, maxval=rotate_range
    )
    scales = 1.0 + jax.random.uniform(
        k_scale, (b, 3), minval=-scale_range, maxval=scale_range
    )
    trans = jax.random.uniform(
        k_tr, (b, 3), minval=-translate_range, maxval=translate_range
    )
    vols = x.astype(jnp.float32).squeeze(-1)
    warped = affine_warp_matmul(vols, angles, scales, trans, mode=mode)
    warped = warped[..., None]
    keep = apply.reshape((b,) + (1,) * (x.ndim - 1))
    return jnp.where(keep, warped, x.astype(jnp.float32))


def random_elastic(
    x: jax.Array,
    key,
    prob: float,
    sigma_range=(5.0, 8.0),
    magnitude_range=(100.0, 200.0),
    grid: int = 8,
):
    """Rand3DElastic-equivalent: a smooth random displacement field, built as
    low-resolution Gaussian noise trilinearly upsampled (the upsampling *is*
    the smoothing; magnitude is scaled to match MONAI's field amplitude after
    its sigma-blur, i.e. displacement std ~ magnitude / (sigma * (2pi)^1.5))."""
    b, d, h, w = x.shape[:4]
    k_apply, k_field, k_mag, k_sigma = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    mag = jax.random.uniform(
        k_mag, (b, 1, 1, 1, 1),
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    sigma = jax.random.uniform(
        k_sigma, (b, 1, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1]
    )
    low = jax.random.normal(k_field, (b, grid, grid, grid, 3))
    disp = jax.image.resize(low, (b, d, h, w, 3), method="linear")
    disp = disp * mag / (sigma * (2 * jnp.pi) ** 1.5)

    # Static displacement band from the config ranges: 3 sigma of the field
    # amplitude at (max magnitude, min sigma); values beyond are clamped.
    max_disp = max(
        1, int(np.ceil(
            3.0 * magnitude_range[1]
            / (sigma_range[0] * (2.0 * np.pi) ** 1.5)
        ))
    )
    vols = x.astype(jnp.float32).squeeze(-1)
    warped = displacement_warp(vols, disp, max_disp)[..., None]
    keep = apply.reshape((b,) + (1,) * (x.ndim - 1))
    return jnp.where(keep, warped, x.astype(jnp.float32))


def random_crop_resize(
    x: jax.Array, key, prob: float, roi, out_size
) -> jax.Array:
    """OneOf{identity p=1-prob, random-center crop to ``roi`` p=prob} followed
    by resize to out_size (the dung stack's OneOf + Resize, reference
    1674-1685). Crop offsets are dynamic slices — static shapes under jit."""
    b, d, h, w, c = x.shape
    k_apply, k_off = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    roi = tuple(min(r, s) for r, s in zip(roi, (d, h, w)))
    maxoff = jnp.array([d - roi[0], h - roi[1], w - roi[2]], jnp.int32)
    offs = (
        jax.random.uniform(k_off, (b, 3)) * (maxoff[None].astype(jnp.float32) + 1)
    ).astype(jnp.int32)
    offs = jnp.minimum(offs, maxoff[None])

    def crop_one(vol, off):
        return jax.lax.dynamic_slice(vol, (off[0], off[1], off[2], 0), (*roi, c))

    cropped = jax.vmap(crop_one)(x.astype(jnp.float32), offs)
    cropped = jax.image.resize(cropped, (b, *out_size, c), method="linear")
    full = resize_batch(x, out_size)
    keep = apply.reshape((b, 1, 1, 1, 1))
    return jnp.where(keep, cropped, full)


# ---------------------------------------------------------------------------
# Stacks
# ---------------------------------------------------------------------------

def build_eval_transform(cfg) -> Callable[[jax.Array], jax.Array]:
    """Validation/eval: resize (if needed) + z-score (reference 1742-1752)."""
    target = cfg.input_size

    def fn(x):
        return zscore(resize_batch(x, target))

    return fn


def build_train_augment(cfg) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Training stack chosen by config flags (reference 1656-1752)."""
    target = cfg.input_size

    if cfg.get("IS_DUNG_TRANSFORMS", False):
        img_size = tuple(cfg.IMG_SIZE)

        def fn(x, key):
            k1, k2, k3 = jax.random.split(key, 3)
            x = random_affine(x, k1, prob=1.0, rotate_range=0.05, scale_range=0.1)
            x = random_crop_resize(x, k2, prob=0.7, roi=(132, 154, 132),
                                   out_size=img_size)
            x = resize_batch(x, target)
            x = random_flip(x, k3, prob=0.5, axis=1)
            return zscore(x)

        return fn

    if cfg.get("USE_EXTENDED_DATA_AUGMENTATION", False):

        def fn(x, key):
            ks = jax.random.split(key, 11)
            x = random_affine(
                x, ks[0], prob=0.5, rotate_range=0.5235987756,
                scale_range=0.3, translate_range=10.0, mode="border",
            )
            x = random_elastic(x, ks[1], prob=0.2)
            x = rician_noise(x, ks[2], prob=0.2)
            x = gaussian_noise(x, ks[3], prob=0.2, noise_factor=0.1)
            x = random_bias_field(x, ks[4], prob=0.3)
            x = random_adjust_contrast(x, ks[5], prob=0.3, gamma=(0.7, 1.5))
            x = random_scale_intensity(x, ks[6], prob=0.3, factors=(-0.5, 1.0))
            x = random_histogram_shift(x, ks[7], prob=0.2)
            x = kspace_spike_noise(x, ks[8], prob=0.1, intensity_range=(13, 15))
            x = gibbs_noise(x, ks[9], prob=0.2, alpha=(0.5, 1.0))
            x = resize_batch(x, target)
            x = random_flip(x, ks[10], prob=0.5, axis=1)
            return zscore(x)

        return fn

    # minimal (default): resize + normalize, same as validation
    def fn(x, key):
        del key
        return zscore(resize_batch(x, target))

    return fn
