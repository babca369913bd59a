"""Bench resilience to the axon-tunnel outage class (BENCH_r02 was a raw
JaxRuntimeError traceback): the retry window polls in subprocesses and a
never-up backend yields ONE parseable diagnostic JSON line, not a stack."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_wait_for_tpu_retries_until_probe_passes():
    import bench

    calls = []

    def probe(timeout_s):
        calls.append(timeout_s)
        return len(calls) >= 3

    assert bench.wait_for_tpu(60, probe=probe, interval_s=0.01)
    assert len(calls) == 3


def test_wait_for_tpu_gives_up_at_budget():
    import bench

    calls = []

    def probe(timeout_s):
        calls.append(timeout_s)
        return False

    # budget under the 10 s probe minimum: give up WITHOUT probing (a probe
    # can't import jax in that window, and granting the clamp minimum would
    # overshoot the documented budget)
    assert not bench.wait_for_tpu(0.05, probe=probe, interval_s=0.01)
    assert not calls

    # real budget: every probe gets at most the remaining budget, never the
    # old 150 s clamp past the deadline
    assert not bench.wait_for_tpu(11, probe=probe, interval_s=11)
    assert calls and all(t <= 11 for t in calls)


def test_measure_retry_recovers_from_one_runtime_error(monkeypatch, capsys):
    """A degraded worker raising JaxRuntimeError mid-step (observed
    2026-08-19 15:53) costs one retry, not the round's bench sample."""
    import jax

    import bench

    calls = []

    def flaky_measure(on_tpu):
        calls.append(on_tpu)
        if len(calls) == 1:
            raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: TPU")
        return 52.2

    monkeypatch.setattr(bench, "_measure", flaky_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 52.2
    assert len(calls) == 2


def test_measure_retry_exhaustion_emits_diagnostic(monkeypatch, capsys):
    import jax

    import bench

    def dead_measure(on_tpu):
        raise jax.errors.JaxRuntimeError("INTERNAL: worker crashed")

    monkeypatch.setattr(bench, "_measure", dead_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["error"] == "tpu_unavailable"
    assert line["value"] is None


def test_bench_emits_diagnostic_json_on_simulated_outage():
    # PALLAS_AXON_POOL_IPS= makes sitecustomize skip axon registration, and
    # JAX_PLATFORMS="" (not "cpu") keeps bench in expect-TPU mode — so the
    # liveness probe sees a cpu-only backend and must report the outage.
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = ""
    env["VSN_BENCH_TPU_WAIT_S"] = "1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["error"] == "tpu_unavailable"
    assert line["value"] is None
    assert line["metric"].startswith("swin3d_5c_train")
