import builtins

import numpy as np

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
