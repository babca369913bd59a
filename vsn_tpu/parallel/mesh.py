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


def _put_sharded(x, sh: NamedSharding, batch_axis: int):
    """device_put one batch array; multi-process hosts hold only their own
    block of the global batch and assemble the global array from local data
    (the jax analogue of DDP's per-rank loaders)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)  # pragma: no cover — needs a real pod
    global_shape = list(x.shape)
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(sh, x, tuple(global_shape))


def shard_train_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a train batch dict with axis-1 sharding on every array.

    Multi-process: each host passes its process-local [A, B_local, ...]
    block (TrainPipeline(rank, world_size) emits exactly that) and the
    global [A, B_global, ...] array is assembled across hosts.
    """
    sh = batch_sharding(mesh, 1)
    return jax.tree.map(lambda x: _put_sharded(x, sh, 1), batch)


def shard_eval_batch(images, mesh: Mesh):
    return _put_sharded(images, batch_sharding(mesh, 0), 0)


def pad_batch_to_multiple(batch_size: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= batch_size."""
    return int(-(-batch_size // n_devices) * n_devices)
