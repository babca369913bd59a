"""Driver-contract tests for ``__graft_entry__.dryrun_multichip``.

Round-1 failure mode: the axon sitecustomize hands the process one remote TPU
device, so the dryrun must self-bootstrap a clean n-device CPU subprocess.
These tests cover both invocation modes:

- inline (this test process already IS an 8-device CPU JAX, via conftest.py);
- subprocess re-exec from an environment that looks like the driver's
  (no JAX_PLATFORMS/XLA_FLAGS hints).

The dryrun itself asserts DP correctness: the 8-device sharded step must
numerically match the identical 1-device step (the claim the reference's DDP
wrap makes implicitly — /root/reference/utils/distributed_training.py:64-78 —
but never tests).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_inline(monkeypatch):
    import __graft_entry__ as g

    # conftest configured JAX_PLATFORMS=cpu + 8 virtual devices, so the env
    # check passes and this runs in-process (no subprocess spawn). The
    # resident-path compile is opt-in (driver budget skips it) — exercise it
    # here so the suite covers all three compiles.
    monkeypatch.setenv("VSN_DRYRUN_RESIDENT", "1")
    assert g._cpu_env_ready(8)
    g.dryrun_multichip(8)


def test_dryrun_multichip_reexecs_from_exact_driver_env():
    """MULTICHIP_r01..r03 regression: the driver exports JAX_PLATFORMS=cpu +
    XLA_FLAGS but leaves PALLAS_AXON_POOL_IPS set, so the sitecustomize
    still registers the axon TPU backend. _cpu_env_ready must NOT trust the
    env vars then — it must re-exec with the pool IP cleared."""
    env = dict(os.environ)
    env.pop("_VSN_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g;"
         "assert not g._cpu_env_ready(4), 'env check fooled by pool IP';"
         "g.dryrun_multichip(4)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4): OK" in proc.stdout


def test_dryrun_multichip_reexecs_from_driver_like_env():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_VSN_DRYRUN_CHILD")
    }
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4): OK" in proc.stdout
