import builtins

import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.parallel import distributed as D
from vsn_tpu.parallel import mesh as meshlib


def test_single_process_helpers():
    assert D.maybe_initialize() is False  # no coordinator env in tests
    assert D.get_rank() == 0
    assert D.get_world_size() == 1
    assert D.is_main_process()
    D.barrier()  # no-op single process
    x = np.arange(3)
    assert D.process_allgather(x) is x


def test_setup_for_distributed_print_patch():
    orig = D.setup_for_distributed(is_master=False)
    try:
        captured = []
        # non-master prints are swallowed; force=True passes through
        builtins.print("hidden")
        builtins.print("shown", force=True)
    finally:
        builtins.print = orig


def test_mesh_sharding_specs():
    import jax

    mesh = meshlib.make_mesh()
    assert mesh.size == len(jax.devices())
    sh = meshlib.batch_sharding(mesh, 1)
    assert sh.spec[1] == "data"
    assert meshlib.pad_batch_to_multiple(5, 8) == 8
    assert meshlib.pad_batch_to_multiple(8, 8) == 8
    assert meshlib.pad_batch_to_multiple(9, 8) == 16


# ---------------------------------------------------------------------------
# multi-host input sharding (simulated: N pipeline instances, one process)
# ---------------------------------------------------------------------------

def _mk_ds(n=32, k=3, seed=0):
    import pandas as pd
    from vsn_tpu.data.pipeline import InMemoryDataset

    rng = np.random.default_rng(seed)
    diseases = ["CN", "AD", "FTD"][:k]

    class FakeDS:
        pass

    ds = FakeDS()
    ds.labels_str = np.asarray([diseases[i % k] for i in range(n)])
    ds.diseases = diseases
    idx = {d: i for i, d in enumerate(diseases)}
    ds.labels = np.eye(k, dtype=np.float32)[[idx[d] for d in ds.labels_str]]
    vols = rng.standard_normal((n, 4, 4, 4, 1)).astype(np.float16)
    ds.images = vols
    ds.gather = lambda ii: vols[ii]
    ds.spatial_shape = (4, 4, 4)
    ds.__class__.__len__ = lambda self: n
    return ds


@pytest.mark.parametrize("balanced", [False, True])
def test_train_pipeline_rank_blocks_tile_the_global_batch(balanced):
    """W simulated hosts with a shared seed must emit disjoint blocks whose
    concatenation equals the single-host global batch (incl. mix plans)."""
    from vsn_tpu.config import load_config
    from vsn_tpu.data.pipeline import TrainPipeline

    cfg = load_config(extra_overrides=dict(
        DISEASES=["CN", "AD", "FTD"], USE_MIXUP=True, MIXUP_PROB=0.7,
        USE_BALANCED_SAMPLER=balanced, SEED=5,
    ))
    ds = _mk_ds(32)
    kw = dict(grad_accum=2, micro_batch=8, seed=5)
    world = 2
    pipes = [
        TrainPipeline(ds, cfg, rank=r, world_size=world, **kw)
        for r in range(world)
    ]
    ref = TrainPipeline(ds, cfg, **kw)

    for _ in range(3):  # crosses an epoch boundary at n=32, per_step=16
        parts = [next(p) for p in pipes]
        glob = next(ref)
        for key in glob:
            merged = np.concatenate([p[key] for p in parts], axis=1)
            np.testing.assert_array_equal(merged, glob[key], err_msg=key)


def test_train_pipeline_world_size_must_divide():
    from vsn_tpu.config import load_config
    from vsn_tpu.data.pipeline import TrainPipeline

    cfg = load_config(extra_overrides=dict(DISEASES=["CN", "AD", "FTD"]))
    with pytest.raises(ValueError, match="divisible"):
        TrainPipeline(_mk_ds(), cfg, grad_accum=1, micro_batch=9,
                      world_size=2)


def test_eval_pipeline_local_blocks():
    from vsn_tpu.data.pipeline import EvalPipeline

    ds = _mk_ds(10)
    world = 2
    pipes = [
        EvalPipeline(ds, batch_size=8, rank=r, world_size=world)
        for r in range(world)
    ]
    ref = EvalPipeline(ds, batch_size=8)
    for batches in zip(*(p.iter_with_indices() for p in pipes),
                       ref.iter_with_indices()):
        *locals_, glob = batches
        g_img, g_lab, g_valid, g_pad = glob
        merged = np.concatenate([b[0] for b in locals_], axis=0)
        np.testing.assert_array_equal(merged, g_img)
        for b in locals_:  # labels/valid/pad stay global on every host
            np.testing.assert_array_equal(b[1], g_lab)
            np.testing.assert_array_equal(b[2], g_valid)
            np.testing.assert_array_equal(b[3], g_pad)
        # local_slice picks each host's rows of the padded index batch
        np.testing.assert_array_equal(
            np.concatenate([p.local_slice(g_pad) for p in pipes]), g_pad
        )


def test_fetch_global_and_broadcast_seed_single_process():
    from vsn_tpu.parallel.distributed import broadcast_seed, fetch_global

    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(fetch_global(x), np.asarray(x))
    assert broadcast_seed(7) == 7
    assert broadcast_seed(None) is None
