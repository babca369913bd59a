"""REAL 2-process jax.distributed test on CPU (VERDICT r2 item 10).

The other distributed tests fake ranks inside one process; this one boots
two actual jax.distributed processes over a local coordinator and runs the
multi-host glue (process_allgather, broadcast_seed, barrier, fetch_global
on a non-fully-addressable array, rank-strided sampler) in its true
topology. Reference anchor: train/train_transformer.py:550-647 (gather),
utils/distributed_training.py:11-79 (env bootstrap).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(tmp_path, port, attempt):
    procs, outs = [], []
    for r in range(2):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update(
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(r),
        )
        out = tmp_path / f"out{attempt}_{r}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_distributed_worker.py"),
             str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    return procs, outs, logs


def test_two_process_jax_distributed(tmp_path):
    # _free_port closes the probe socket before the coordinator binds it —
    # a TOCTOU window another process can win. One retry on a fresh port
    # keeps the suite from flaking on that race.
    for attempt in range(2):
        procs, outs, logs = _launch_pair(tmp_path, _free_port(), attempt)
        if all(p.returncode == 0 for p in procs):
            break
        joined = "\n---\n".join(logs)
        if attempt == 0 and ("Failed to bind" in joined
                             or "address already in use" in joined.lower()):
            continue
        raise AssertionError(joined[-4000:])

    results = [json.loads(o.read_text()) for o in outs]
    results.sort(key=lambda d: d["rank"])
    # one broadcast seed everywhere
    assert results[0]["seed"] == results[1]["seed"]
    assert all(d["n_devices"] == 4 for d in results)

    # the rank slices must interleave back into the single global epoch
    # draw (disjoint coverage, with-replacement duplicates preserved)
    seed = results[0]["seed"]
    weights = np.asarray([1.0, 2.0, 1.0, 4.0, 1.0, 1.0], np.float64)
    p = weights / weights.sum()
    full = np.random.default_rng(seed).choice(6, size=12, replace=True, p=p)
    np.testing.assert_array_equal(results[0]["indices"], full[0::2])
    np.testing.assert_array_equal(results[1]["indices"], full[1::2])
