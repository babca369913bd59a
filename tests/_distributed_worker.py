"""Worker process for the REAL 2-process jax.distributed CPU test.

Launched by tests/test_distributed_2proc.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set (the env-var contract
vsn_tpu.parallel.distributed.maybe_initialize consumes — the analogue of
the reference's torchrun env bootstrap, utils/distributed_training.py:11-79).
Exercises, in a genuine multi-process topology rather than a single-process
simulation: maybe_initialize detection, process_allgather,
broadcast_seed agreement, barrier, fetch_global on a non-fully-addressable
global array, and the sampler's rank-strided epoch partition.

Writes a JSON result to argv[1]; exits non-zero on any assertion failure.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path: str) -> None:
    import jax

    from vsn_tpu.parallel import distributed as dist

    assert dist.maybe_initialize(), "multi-process launch not detected"
    rank, world = dist.get_rank(), dist.get_world_size()
    assert world == 2, world
    assert len(jax.devices()) == 4, jax.devices()  # 2 local per process

    # process_allgather: every process contributes its host-local rows
    local = np.full((3,), rank, np.int32)
    gathered = np.asarray(dist.process_allgather(local))
    assert gathered.shape == (2, 3), gathered.shape
    assert (gathered[0] == 0).all() and (gathered[1] == 1).all(), gathered

    # broadcast_seed(None): rank 0's entropy must win on every process
    seed = dist.broadcast_seed(None)

    dist.barrier("worker-mid")

    # fetch_global on a GLOBAL array sharded over all 4 devices (2 of them
    # non-addressable from this process) — the pad/trim gather path that
    # single-process tests can only fake
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    global_data = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = jax.make_array_from_callback(
        global_data.shape, sharding, lambda idx: global_data[idx]
    )
    assert not arr.is_fully_addressable
    fetched = dist.fetch_global(arr)
    np.testing.assert_array_equal(fetched, global_data)

    # rank-strided sampler partition with the agreed seed
    from vsn_tpu.data.sampler import weighted_epoch_indices

    weights = np.asarray([1.0, 2.0, 1.0, 4.0, 1.0, 1.0], np.float64)
    mine = weighted_epoch_indices(
        weights, 12, np.random.default_rng(seed), rank=rank, world_size=2
    )

    with open(out_path, "w") as f:
        json.dump({
            "rank": rank,
            "seed": int(seed),
            "indices": [int(i) for i in mine],
            "n_devices": len(jax.devices()),
        }, f)
    print(f"worker {rank} OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
