"""Test-Time Augmentation with inverse-entropy weighted averaging.

View recipe matches reference eval/test_time_augmentation.py:14-120:
identity + deterministic sagittal flip + ``num_samples`` random small affines
(rot ±3° per axis, translate ±5 voxels) + one 0.9-scale center-crop->resize
(default total 8 views); per-view softmax; final prediction is the
inverse-entropy weighted mean w_v ∝ 1/(H_v + eps) (326-354) or uniform.

TPU-first: the reference augments on CPU and runs ~8 separate forwards per
sample (221-354). Here all views are generated ON DEVICE and stacked into the
batch axis — one model call per input batch of shape [B*V, ...]; the
augmentation fuses with the forward under jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vsn_tpu.data.augment import affine_warp_matmul, resize_batch


def _center_crop_resize(x: jax.Array, scale: float) -> jax.Array:
    b, d, h, w, c = x.shape
    roi = [max(1, int(round(s * scale))) for s in (d, h, w)]
    starts = [(s - r) // 2 for s, r in zip((d, h, w), roi)]
    crop = x[:, starts[0]:starts[0] + roi[0], starts[1]:starts[1] + roi[1],
             starts[2]:starts[2] + roi[2], :]
    return resize_batch(crop, (d, h, w))


def make_tta_views(
    num_samples: int = 5,
    use_flip: bool = True,
    use_affine: bool = True,
    use_scaled_center_crop: bool = True,
    crop_roi_scale: float = 0.9,
    affine_rotate_deg: float = 3.0,
    affine_translate_vox: float = 5.0,
):
    """Returns fn(x [B,D,H,W,C], rng) -> views [B, V, D, H, W, C]."""
    rot = float(np.deg2rad(affine_rotate_deg))

    def views_fn(x, rng):
        views = [x]
        if use_flip:
            views.append(jnp.flip(x, axis=1))
        if use_affine:
            b = x.shape[0]
            vols = x.astype(jnp.float32).squeeze(-1)
            for i in range(num_samples):
                k = jax.random.fold_in(rng, i)
                k_r, k_t = jax.random.split(k)
                angles = jax.random.uniform(k_r, (b, 3), minval=-rot, maxval=rot)
                trans = jax.random.uniform(
                    k_t, (b, 3), minval=-affine_translate_vox,
                    maxval=affine_translate_vox,
                )
                scales = jnp.ones((b, 3))
                # matmul-based warp: gather-free, MXU-friendly (the
                # map_coordinates path is ~50x slower on TPU)
                warped = affine_warp_matmul(
                    vols, angles, scales, trans, mode="zeros"
                )[..., None]
                views.append(warped.astype(x.dtype))
        if use_scaled_center_crop:
            views.append(_center_crop_resize(x, crop_roi_scale).astype(x.dtype))
        return jnp.stack(views, axis=1)  # [B, V, ...]

    n_views = 1 + int(use_flip) + (num_samples if use_affine else 0) + int(
        use_scaled_center_crop
    )
    return views_fn, n_views


def entropy_weighted_average(probs: jax.Array, use_entropy_weighting: bool = True):
    """probs [B, V, K] -> [B, K]; w_v = 1/(H_v + 1e-10), renormalized
    (reference 326-354)."""
    if not use_entropy_weighting:
        return probs.mean(axis=1)
    h = -(probs * jnp.log(probs + 1e-10)).sum(-1)  # [B, V]
    w = 1.0 / (h + 1e-10)
    w = w / w.sum(axis=1, keepdims=True)
    return (probs * w[..., None]).sum(axis=1)


def make_tta_predictor(
    model,
    eval_transform=None,
    num_samples: int = 5,
    use_flip: bool = True,
    use_affine: bool = True,
    use_scaled_center_crop: bool = True,
    crop_roi_scale: float = 0.9,
    use_entropy_weighting: bool = True,
):
    """Returns jittable fn(variables, images [B,...], rng) -> probs [B, K].

    Equivalent of reference create_tta_predictor (test_time_augmentation.py:
    397-445). ``eval_transform`` (resize + z-score) is applied per view AFTER
    augmentation, matching the reference's eval loader ordering.
    """
    views_fn, n_views = make_tta_views(
        num_samples, use_flip, use_affine, use_scaled_center_crop, crop_roi_scale
    )

    def predict(variables, images, rng):
        views = views_fn(images, rng)  # [B, V, ...]
        b, v = views.shape[:2]
        flat = views.reshape(b * v, *views.shape[2:])
        if eval_transform is not None:
            flat = eval_transform(flat)
        logits = model.apply(variables, flat, True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = probs.reshape(b, v, -1)
        return entropy_weighted_average(probs, use_entropy_weighting)

    return predict, n_views
