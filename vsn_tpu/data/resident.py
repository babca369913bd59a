"""Device-resident volume cache: keep the fold's training volumes in HBM and
assemble each step's batch on device from sampler indices.

The reference preloads the cache into host RAM (PRELOAD_DATA,
dataset/dataset.py:81-101) and ships gathered tensors to the GPU every step.
On TPU the idiomatic stronger form is to push the whole cache across the
host->device boundary ONCE and make batch assembly a device-side row gather:
the host ships only int32 index arrays per step (a few hundred bytes), so
training throughput is decoupled from host RAM bandwidth, DataLoader workers,
and the host->device link entirely. The row gather ([N, D, H, W, 1] taken
along axis 0 with whole-volume rows) lowers to plain DMA copies, not
voxel-level gathers, so it runs at HBM speed.

Modes (config key PRELOAD_DEVICE):
  * ``"float16"`` / ``"bfloat16"`` — bit-faithful to the host cache; N
    volumes cost N * D*H*W * 2 bytes of HBM.
  * ``"int8"`` — per-volume affine quantization (uint8 codes + f32
    scale/offset from the volume's min/max — the mode name is the config's
    public term for "8-bit"); halves HBM. MRI volumes are smooth and every
    model input is z-score normalized downstream, so the <=0.2% range error
    is far below augmentation noise. NOTE: this makes evaluation through a
    resident store slightly LOSSY relative to the host pipeline
    (float16/bfloat16 modes are bit-faithful —
    tests/test_resident.py::test_evaluator_resident_matches_plain).
  * ``False`` — off (host pipeline ships gathered volumes, the default).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ResidentVolumes(NamedTuple):
    """Device-side volume store. ``data`` is [N, D, H, W, C]; ``scale`` and
    ``offset`` are [N] f32 dequantization params (int8 mode) or None."""

    data: jax.Array
    scale: Optional[jax.Array]
    offset: Optional[jax.Array]

    @property
    def nbytes(self) -> int:
        n = self.data.size * self.data.dtype.itemsize
        for t in (self.scale, self.offset):
            if t is not None:
                n += t.size * t.dtype.itemsize
        return n


def quantize_volumes_int8(images: np.ndarray):
    """Per-volume affine uint8 quantization. Returns (q, scale, offset) with
    x ~= q * scale + offset."""
    n = images.shape[0]
    flat = images.reshape(n, -1).astype(np.float32)
    lo = flat.min(axis=1)
    hi = flat.max(axis=1)
    scale = np.maximum(hi - lo, 1e-8) / 255.0
    q = np.rint((flat - lo[:, None]) / scale[:, None]).astype(np.uint8)
    return q.reshape(images.shape), scale.astype(np.float32), lo.astype(np.float32)


def resident_pretransform(cfg, train: bool):
    """The deterministic per-volume transform to bake into the store at build
    time, or None when the store must stay raw.

    Eval volumes always go through resize + z-score (reference
    train/train_transformer.py:1742-1752), which is deterministic, so the
    eval store can always be pre-transformed. The TRAIN store is only
    eligible when the pipeline is minimal (no dung/extended augmentation)
    AND MixUp/CutMix are off — the reference z-scores AFTER mixing
    (dataset/dataset.py:288-291), so pre-normalized volumes would change the
    mixed statistics. Measured residual this targets: 44.1 ms of ViT's
    410 ms step is the deterministic resize+normalize (BASELINE.md).

    Escape hatch: PRELOAD_PRETRANSFORM=False keeps every store raw.
    """
    if not cfg.get("PRELOAD_PRETRANSFORM", True):
        return None
    if train and (
        cfg.get("IS_DUNG_TRANSFORMS", False)
        or cfg.get("USE_EXTENDED_DATA_AUGMENTATION", False)
        or cfg.get("USE_MIXUP", False)
        or cfg.get("USE_CUTMIX", False)
    ):
        return None
    from vsn_tpu.data.augment import build_eval_transform

    return build_eval_transform(cfg)


def build_resident(images: np.ndarray, mode: str, mesh=None,
                   pretransform=None, chunk: int = 8) -> ResidentVolumes:
    """Upload the [N, D, H, W, C] cache to device, replicated over ``mesh``.

    Replication (rather than sharding volumes over the data axis) keeps any
    device able to serve any sampler index; at these cohort sizes the cache
    fits a single chip's HBM (int8: ~2.9 MB/volume at 144^3). Multi-host DP
    naturally holds per-host copies.

    ``pretransform`` (optional): a deterministic [B, D, H, W, C] -> volume
    transform (see ``resident_pretransform``) applied ON DEVICE in chunks at
    build time; the store then holds transformed volumes and the train/eval
    step skips the per-step resize+normalize entirely. Never round-trips
    volumes back through the slow host link. Storage rounds the normalized
    volumes to the store dtype (f16/bf16 ~1e-3 relative, int8 lossier) —
    bounded by tests/test_resident.py pretransform parity tests.
    """
    mode = str(mode).lower()
    if pretransform is not None:
        return _build_resident_transformed(
            images, mode, pretransform, mesh, chunk
        )
    if mode in ("float16", "f16", "fp16", "true", "1"):
        arrs = {"data": images.astype(np.float16)}
        scale = offset = None
    elif mode in ("bfloat16", "bf16"):
        arrs = {"data": images.astype(jnp.bfloat16)}
        scale = offset = None
    elif mode == "int8":
        q, scale, offset = quantize_volumes_int8(images)
        arrs = {"data": q, "scale": scale, "offset": offset}
    else:
        raise ValueError(f"unknown PRELOAD_DEVICE mode: {mode!r}")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P())
        put = lambda a: jax.device_put(a, sharding)
    else:
        put = jax.device_put

    return ResidentVolumes(
        data=put(arrs["data"]),
        scale=put(arrs["scale"]) if scale is not None else None,
        offset=put(arrs["offset"]) if offset is not None else None,
    )


def _build_resident_transformed(images, mode, fn, mesh, chunk):
    """Transform-at-build path: raw chunks go host->device once, the jitted
    transform runs on device, and only transformed volumes are kept (int8
    quantizes on device too — no device->host fetch anywhere)."""
    if mode in ("float16", "f16", "fp16", "true", "1"):
        store_dtype = jnp.float16
    elif mode in ("bfloat16", "bf16"):
        store_dtype = jnp.bfloat16
    elif mode == "int8":
        store_dtype = None
    else:
        raise ValueError(f"unknown PRELOAD_DEVICE mode: {mode!r}")

    jfn = jax.jit(fn)

    @jax.jit
    def quant(t):
        flat = t.reshape(t.shape[0], -1)
        lo = flat.min(axis=1)
        scale = jnp.maximum(flat.max(axis=1) - lo, 1e-8) / 255.0
        q = jnp.rint((flat - lo[:, None]) / scale[:, None]).astype(jnp.uint8)
        return q.reshape(t.shape), scale, lo

    n = images.shape[0]
    data_chunks, scales, offsets = [], [], []
    for i in range(0, n, chunk):
        raw = images[i:i + chunk]
        pad = chunk - raw.shape[0]
        if pad:  # pad the ragged final chunk: one compiled shape, not two
            raw = np.concatenate([raw, raw[-1:].repeat(pad, axis=0)])
        x = jnp.asarray(raw, jnp.float32)
        t = jfn(x)
        if store_dtype is None:
            q, s, o = quant(t)
            data_chunks.append(q)
            scales.append(s)
            offsets.append(o)
        else:
            data_chunks.append(t.astype(store_dtype))
    data = jnp.concatenate(data_chunks, axis=0)[:n]
    scale = jnp.concatenate(scales)[:n] if scales else None
    offset = jnp.concatenate(offsets)[:n] if offsets else None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P())
        put = lambda a: jax.device_put(a, sharding)
    else:
        put = lambda a: a

    return ResidentVolumes(
        data=put(data),
        scale=put(scale) if scale is not None else None,
        offset=put(offset) if offset is not None else None,
    )


def gather_volumes(res: ResidentVolumes, idx: jax.Array) -> jax.Array:
    """[B] int32 -> [B, D, H, W, C] volumes (jit-traceable device gather).

    float16/bfloat16 stores return their dtype unchanged (bit-faithful to the
    host cache); int8 dequantizes to float32.
    """
    vols = jnp.take(res.data, idx, axis=0)
    if res.scale is None:
        return vols
    bshape = (idx.shape[0],) + (1,) * (vols.ndim - 1)
    scale = jnp.take(res.scale, idx).reshape(bshape)
    offset = jnp.take(res.offset, idx).reshape(bshape)
    return vols.astype(jnp.float32) * scale + offset


def resolve_micro(micro: dict, res: Optional[ResidentVolumes]) -> dict:
    """Replace image_idx/partner_idx index fields with gathered volumes.

    No-op when ``res`` is None or the micro-batch already carries images
    (host-pipeline mode), so the train step works identically in both modes.
    """
    if res is None or "image_idx" not in micro:
        return micro
    out = dict(micro)
    out["image"] = gather_volumes(res, out.pop("image_idx"))
    if "partner_idx" in out:
        out["image2"] = gather_volumes(res, out.pop("partner_idx"))
    return out
