"""Device mesh + sharding helpers.

The reference scales with DDP over NCCL (SURVEY.md §2.2). The TPU-native
equivalent is a 1-D ``Mesh(('data',))`` with the batch dimension sharded and
parameters replicated — XLA emits the gradient psum from the shardings, and
the collectives ride ICI. Models here are small (<= ~30 M params), so
replicated params (plain DP) is the right point in the design space; the
mesh helper accepts extra axes for future tensor-parallel experiments.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, batch_axis: int = 1) -> NamedSharding:
    """Shard one axis of a batch array over 'data'; replicate the rest.

    Train batches are [A(accum), B(global micro), ...] — axis 1 is sharded.
    Eval batches are [B, ...] — pass batch_axis=0.
    """
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a train batch dict with axis-1 sharding on every array."""
    sh = batch_sharding(mesh, 1)
    return jax.device_put(batch, jax.tree.map(lambda _: sh, batch))


def shard_eval_batch(images, mesh: Mesh):
    return jax.device_put(images, batch_sharding(mesh, 0))


def pad_batch_to_multiple(batch_size: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= batch_size."""
    return int(-(-batch_size // n_devices) * n_devices)
