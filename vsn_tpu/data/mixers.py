"""MixUp / CutMix — host-side partner & parameter selection, device-side math.

Reference semantics (dataset/dataset.py):
  * MRIMixUp (184-295): with prob ``mixup_prob`` mix a sample with a partner
    drawn from a *different* class; lam ~ Beta(alpha, alpha); both image and
    one-hot label are mixed with the same lam; augmentation applies after.
  * MRICutMix (298-495): partner from a *random* class (same class allowed,
    345-368); a cuboid with edge fraction sqrt(1-lam) at a random center is
    replaced by the partner's voxels; the label weight is the *actual* volume
    ratio of the cuboid (467-481).

TPU-first split: the cheap per-sample randomness (partner indices over the
full dataset, lam, cuboid bounds) happens on host in the input pipeline with
the reference's per-(epoch, idx) determinism scheme; the voxel math (lerp /
masked replace over [B, D, H, W, C]) runs on device, fused into the train
step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def apply_mixup(x1, x2, y1, y2, lam, apply):
    """x = lam*x1 + (1-lam)*x2 where apply, else x1; same for labels."""
    b = x1.shape[0]
    lam_x = lam.reshape((b,) + (1,) * (x1.ndim - 1)).astype(jnp.float32)
    app_x = apply.reshape((b,) + (1,) * (x1.ndim - 1))
    x = jnp.where(
        app_x, lam_x * x1.astype(jnp.float32) + (1 - lam_x) * x2.astype(jnp.float32),
        x1.astype(jnp.float32),
    )
    lam_y = lam.reshape((b, 1)).astype(jnp.float32)
    app_y = apply.reshape((b, 1))
    y = jnp.where(app_y, lam_y * y1 + (1 - lam_y) * y2, y1)
    return x, y


def apply_cutmix(x1, x2, y1, y2, bounds, actual_lam, apply):
    """Replace the cuboid [b0:b3, b1:b4, b2:b5] with partner voxels where
    apply; label = actual_lam*y1 + (1-actual_lam)*y2."""
    b, d, h, w, _ = x1.shape
    zz = jax.lax.broadcasted_iota(jnp.int32, (b, d, h, w, 1), 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, d, h, w, 1), 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, d, h, w, 1), 3)

    def bound(i):
        return bounds[:, i].reshape(b, 1, 1, 1, 1)

    inside = (
        (zz >= bound(0)) & (zz < bound(3))
        & (yy >= bound(1)) & (yy < bound(4))
        & (xx >= bound(2)) & (xx < bound(5))
    )
    app_x = apply.reshape((b, 1, 1, 1, 1))
    x = jnp.where(
        inside & app_x, x2.astype(jnp.float32), x1.astype(jnp.float32)
    )
    lam_y = actual_lam.reshape((b, 1)).astype(jnp.float32)
    app_y = apply.reshape((b, 1))
    y = jnp.where(app_y, lam_y * y1 + (1 - lam_y) * y2, y1)
    return x, y


def build_mix_fn(cfg):
    """Returns fn(batch_dict) -> (images, labels) applying the configured mix.

    ``batch`` carries micro-batched fields; this operates on one micro-batch
    (leading axis B).
    """
    if cfg.get("USE_MIXUP", False) and cfg.get("USE_CUTMIX", False):
        raise ValueError("USE_MIXUP and USE_CUTMIX are mutually exclusive")

    if cfg.get("USE_MIXUP", False):

        def fn(batch):
            return apply_mixup(
                batch["image"], batch["image2"], batch["label"], batch["label2"],
                batch["mix_lam"], batch["mix_apply"],
            )

        return fn

    if cfg.get("USE_CUTMIX", False):

        def fn(batch):
            return apply_cutmix(
                batch["image"], batch["image2"], batch["label"], batch["label2"],
                batch["mix_bounds"], batch["mix_lam"], batch["mix_apply"],
            )

        return fn

    return None


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------

def cutmix_bounds(shape, lam, rng) -> tuple[np.ndarray, float]:
    """Cuboid bounds + actual lambda for one sample.

    Mirrors reference dataset.py:345-392 (_compute_cuboid_bounds) and the
    volume accounting at 467-481. ``shape`` is spatial (D, H, W).
    """
    d, h, w = shape
    cut = np.sqrt(1.0 - lam)
    cd, ch, cw = int(d * cut), int(h * cut), int(w * cut)
    zc = rng.integers(0, d + 1)
    yc = rng.integers(0, h + 1)
    xc = rng.integers(0, w + 1)
    z0, z1 = max(0, zc - cd // 2), min(d, zc + cd // 2)
    y0, y1 = max(0, yc - ch // 2), min(h, yc + ch // 2)
    x0, x1 = max(0, xc - cw // 2), min(w, xc + cw // 2)
    vol = (z1 - z0) * (y1 - y0) * (x1 - x0)
    actual_lam = 1.0 - vol / float(d * h * w)
    return np.array([z0, y0, x0, z1, y1, x1], np.int32), actual_lam


class MixPlanner:
    """Host-side per-epoch mix planning over the full dataset.

    Keeps the reference's class-grouped index lists and the "partner from a
    different class" (MixUp) / "partner from a random class" (CutMix) rules.
    Deterministic per (seed, epoch, idx) like the numpy-RNG path at
    dataset.py:230-245.
    """

    def __init__(self, labels_str, diseases, cfg, spatial_shape, seed=None):
        self.mode = (
            "mixup" if cfg.get("USE_MIXUP", False)
            else "cutmix" if cfg.get("USE_CUTMIX", False)
            else None
        )
        self.alpha = float(
            cfg.MIXUP_ALPHA if self.mode == "mixup" else cfg.get("CUTMIX_ALPHA", 1.0)
        )
        self.prob = float(
            cfg.MIXUP_PROB if self.mode == "mixup" else cfg.get("CUTMIX_PROB", 0.5)
        )
        self.spatial_shape = tuple(spatial_shape)
        self.seed = seed
        labels_str = np.asarray(labels_str)
        self.class_indices = {
            c: np.flatnonzero(labels_str == c) for c in np.unique(labels_str)
        }
        self.class_list = sorted(self.class_indices)
        self.labels_str = labels_str

    def plan(self, indices: np.ndarray, epoch: int, rng: np.random.Generator):
        """Returns dict of per-sample arrays for ``indices`` (1-D)."""
        n = len(indices)
        apply = np.zeros(n, bool)
        partner = indices.copy()
        lam = np.ones(n, np.float32)
        bounds = np.zeros((n, 6), np.int32)
        if self.mode is None:
            return dict(mix_apply=apply, partner=partner, mix_lam=lam,
                        mix_bounds=bounds)
        for i, idx in enumerate(indices):
            if rng.random() > self.prob:
                continue
            apply[i] = True
            cls1 = self.labels_str[idx]
            if self.mode == "mixup":
                choices = [c for c in self.class_list if c != cls1]
            else:
                choices = self.class_list
            cls2 = choices[rng.integers(0, len(choices))]
            pool = self.class_indices[cls2]
            partner[i] = pool[rng.integers(0, len(pool))]
            l = float(rng.beta(self.alpha, self.alpha))
            if self.mode == "cutmix":
                bounds[i], l = cutmix_bounds(self.spatial_shape, l, rng)
            lam[i] = l
        return dict(mix_apply=apply, partner=partner, mix_lam=lam,
                    mix_bounds=bounds)
