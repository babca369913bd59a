"""Multi-host (multi-process) runtime glue.

The reference builds its process group from torchrun env vars
(utils/distributed_training.py:11-79). The JAX equivalent is
``jax.distributed.initialize`` — on TPU pods the coordinator/process info
comes from the environment automatically; on other setups it can be passed
via the same env-var contract used here.

Also provides the reference's rank-conditional helpers (rank-0 printing,
save_on_master, barrier) in multihost form.
"""

from __future__ import annotations

import builtins
import os

import jax


_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process launch is detected.

    Detection: JAX_COORDINATOR_ADDRESS (explicit) or cloud-TPU pod metadata
    handled inside jax.distributed.initialize. Safe to call twice. Returns
    True when running multi-process.

    The env check MUST come before any backend-touching call: even
    ``jax.process_count()`` initializes the XLA backend, after which
    ``jax.distributed.initialize`` refuses to run (caught by the real
    2-process test, tests/test_distributed_2proc.py).
    """
    global _initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and not _initialized:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        except RuntimeError as exc:
            # Tolerate a second init in the same process. jax 0.9.0 raises
            # "distributed.initialize should only be called once." — older
            # versions said "already initialized"; match both.
            msg = str(exc)
            if "only be called once" not in msg and "already" not in msg:
                raise
        _initialized = True
        return True
    return jax.process_count() > 1


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync (the reference's dist.barrier after preprocessing)."""
    if jax.process_count() > 1:  # pragma: no cover — needs a real pod
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def setup_for_distributed(is_master: bool | None = None):
    """Rank-0-only printing via a builtins.print patch (reference
    distributed_training.py:82-103). ``force=True`` overrides."""
    if is_master is None:
        is_master = is_main_process()
    builtin_print = builtins.print

    def print_(*args, force: bool = False, **kwargs):
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_
    return builtin_print


def process_allgather(x):
    """Gather host-local arrays across processes (eval predictions); the
    single-process fast path returns the input."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils  # pragma: no cover

    return multihost_utils.process_allgather(x)


def broadcast_seed(seed):
    """Agree on one sampler seed across processes.

    The reference broadcasts the random sampler seed from rank 0
    (train_transformer.py:1852-1855); here an unseeded run draws rank 0's
    entropy and shares it so every host samples the same global epoch
    stream. Explicit seeds pass through unchanged.
    """
    if jax.process_count() == 1:
        return seed
    import numpy as np  # pragma: no cover — needs a real pod
    from jax.experimental import multihost_utils

    local = np.asarray(
        [seed if seed is not None
         else np.random.SeedSequence().generate_state(1)[0] % (2**31)],
        np.int64,
    )
    return int(multihost_utils.broadcast_one_to_all(local)[0])


def fetch_global(x):
    """Device array -> host numpy, across hosts if needed.

    Single-process (or fully-addressable) arrays fetch directly. On a pod,
    each host concatenates its addressable shards (block layout, process-
    ordered) and allgathers — the fixed-length analogue of the reference's
    variable-length all_gather with pad/trim (train_transformer.py:550-568;
    our EvalPipeline pads batches, the valid mask trims).
    """
    import numpy as np

    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils  # pragma: no cover

    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(multihost_utils.process_allgather(local, tiled=True))
