"""3D anchor generation + deform-logit decoding (Deformable-Patch-Location
support).

Parity with reference models/modules/box_coder.py (PointWHD:10-149,
PatchCenterOffset:150-354) — the public support surface for the proprietary
SwinDPL variant. Unreferenced by the public models (like the reference), but
kept so a DPL implementation can plug in.

Functional JAX formulation: anchors are static numpy constants, decoding is
pure (logits -> centers/boxes/sample grids).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def patch_anchors(patch_count: Tuple[int, int, int]) -> np.ndarray:
    """[N, 3] normalized patch-center anchors in row-major (d, h, w) order."""
    strides = [1.0 / p for p in patch_count]
    grid = np.stack(
        np.meshgrid(
            (0.5 + np.arange(patch_count[0])) * strides[0],
            (0.5 + np.arange(patch_count[1])) * strides[1],
            (0.5 + np.arange(patch_count[2])) * strides[2],
            indexing="ij",
        ),
        axis=-1,
    )
    return grid.reshape(-1, 3).astype(np.float32)


class PointWHD:
    """Decode deformation logits into clamped normalized patch centers."""

    def __init__(
        self,
        input_size: Tuple[int, int, int],
        patch_count: Tuple[int, int, int],
        weights: Optional[Tuple[float, float, float]] = None,
        tanh: Optional[bool] = None,
    ):
        self.input_size = tuple(input_size)
        self.patch_count = tuple(patch_count)
        self.weights = weights
        self.tanh = tanh
        self.anchor = jnp.asarray(patch_anchors(self.patch_count))

    def _deltas(self, deform_logits, halve: bool = False):
        pixel = jnp.asarray([1.0 / p for p in self.patch_count])
        w = jnp.asarray(self.weights)
        if self.tanh:
            d = jnp.tanh(deform_logits / w) * pixel
        else:
            d = deform_logits * pixel / w
        return d / 2 if halve else d

    def decode(self, deform_logits: jax.Array) -> jax.Array:
        """[B, N, 3] logits -> [B, N, 3] centers clamped to [0, 1]."""
        centers = self._deltas(deform_logits) + self.anchor[None]
        return jnp.clip(centers, 0.0, 1.0)

    def __call__(self, deform_logits, model_offset=None):
        assert model_offset is None
        return self.decode(deform_logits)

    def get_offsets(self, deform_centers: jax.Array) -> jax.Array:
        """Voxel-space offsets of centers relative to their anchors."""
        size = jnp.asarray(self.input_size, jnp.float32)
        return (deform_centers - self.anchor[None]) * size[None, None]


class PatchCenterOffset(PointWHD):
    """Decode logits into patch bounding boxes + per-patch sampling grids."""

    def __init__(
        self,
        input_size: Tuple[int, int, int],
        patch_count: Tuple[int, int, int],
        weights: Tuple[float, float, float] = (2.0, 2.0, 2.0),
        pts: Tuple[int, int, int] = (1, 1, 1),
        tanh: bool = True,
    ):
        super().__init__(input_size, patch_count, weights, tanh)
        self.patch_pixel = tuple(pts)

    def decode(self, deform_logits: jax.Array) -> jax.Array:
        """[B, N, 3] logits -> [B, N, 6] boxes (min-corner, max-corner).

        Centers are clamped so boxes of one patch-pitch stay inside [0, 1].
        """
        pixel = jnp.asarray([1.0 / p for p in self.patch_count])
        d = self._deltas(deform_logits, halve=True)
        centers = d + self.anchor[None]
        centers = jnp.clip(centers, pixel / 2, 1.0 - pixel / 2)
        return jnp.concatenate(
            [centers - pixel / 2, centers + pixel / 2], axis=-1
        )

    def get_offsets(self, deform_boxes: jax.Array) -> jax.Array:
        size = jnp.asarray(self.input_size, jnp.float32)
        anchor6 = jnp.concatenate([self.anchor, self.anchor], axis=-1)
        return (deform_boxes - anchor6[None]) * jnp.tile(size, 2)[None, None]

    def get_scales(self, deform_boxes: jax.Array) -> jax.Array:
        size = jnp.asarray(self.input_size, jnp.float32)
        return (deform_boxes[..., 3:] - deform_boxes[..., :3]) * size[None, None]

    def meshgrid(self, boxes: jax.Array) -> jax.Array:
        """[B, N, 6] boxes -> [B, N, pd, ph, pw, 3] sampling coordinates:
        per-axis linear interpolation between the box corners (align-corners),
        broadcast into a 3D grid."""
        pd, ph, pw = self.patch_pixel

        def lin(lo, hi, p):
            # align-corners linear interp between the two corners; p=1 keeps
            # the min corner (torch F.interpolate(size=1, align_corners=True)
            # semantics, which the reference relies on)
            t = jnp.asarray([0.0]) if p == 1 else jnp.linspace(0.0, 1.0, p)
            return lo[..., None] + (hi - lo)[..., None] * t  # [B, N, p]

        xs = lin(boxes[..., 0], boxes[..., 3], pd)
        ys = lin(boxes[..., 1], boxes[..., 4], ph)
        zs = lin(boxes[..., 2], boxes[..., 5], pw)
        xs = jnp.broadcast_to(
            xs[:, :, :, None, None], xs.shape[:2] + (pd, ph, pw)
        )
        ys = jnp.broadcast_to(
            ys[:, :, None, :, None], ys.shape[:2] + (pd, ph, pw)
        )
        zs = jnp.broadcast_to(
            zs[:, :, None, None, :], zs.shape[:2] + (pd, ph, pw)
        )
        return jnp.stack([xs, ys, zs], axis=-1)

    def __call__(self, deform_logits, model_offset=None):
        assert model_offset is None
        return self.meshgrid(self.decode(deform_logits))
