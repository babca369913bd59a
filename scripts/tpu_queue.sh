#!/bin/bash
# Measurement queue for when the axon TPU tunnel comes back.
# Runs probes SEQUENTIALLY (never two TPU processes at once) with generous
# timeouts; each writes its own log under /tmp/q_*.log.
#
# Round-3 ordering (VERDICT): the on-chip fused-vs-unfused PARITY probe runs
# first and gates everything — a numeric bug in the Mosaic-compiled kernels
# would poison every number after it. Then the headline bench, then the
# per-change probes, then A/Bs.
#
# Usage: setsid nohup bash scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# Hard deadline (epoch secs) so no queue entry can overlap the driver's
# end-of-round bench window (two TPU processes crash the tunnel). Default:
# 9 hours from queue start; override with VSN_QUEUE_DEADLINE=<epoch> or
# VSN_QUEUE_DEADLINE= (empty) for no deadline.
if [ -z "${VSN_QUEUE_DEADLINE+x}" ]; then
    VSN_QUEUE_DEADLINE=$(date -d "+9 hours" +%s)
fi
# How long to keep polling for the tunnel before giving up (secs).
: "${VSN_QUEUE_WAIT_S:=28800}"

past_deadline() {
    [ -n "${VSN_QUEUE_DEADLINE:-}" ] \
        && [ "$(date +%s)" -ge "$VSN_QUEUE_DEADLINE" ]
}

# Per-entry timeout. Sized for a DEGRADED remote-compile service: on
# 2026-08-19 a single small-geometry forward compile took 983 s (the
# historical norm is 1-6 min for the whole train step), so the old 2400 s
# budget died mid-compile. Override per entry with VSN_QUEUE_TIMEOUT.
: "${VSN_QUEUE_TIMEOUT:=7200}"

run() {
    local name=$1; shift
    if past_deadline; then
        echo "=== $name SKIPPED (deadline) $(date +%H:%M:%S)" \
            | tee -a /tmp/tpu_queue_status.log
        return 0
    fi
    echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

# 0. Poll for tunnel liveness (each probe in a throwaway python; a dead
#    tunnel hangs jax.devices(), so bound every attempt).
t_wait_end=$(( $(date +%s) + VSN_QUEUE_WAIT_S ))
while :; do
    if past_deadline; then
        echo "DEADLINE before tunnel came up $(date +%H:%M:%S)" \
            | tee -a /tmp/tpu_queue_status.log
        exit 1
    fi
    timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
x = jnp.ones((256, 256)); print(float((x @ x).sum()), jax.devices())
" > /tmp/q_alive.log 2>&1 && break
    if [ "$(date +%s)" -ge "$t_wait_end" ]; then
        echo "TUNNEL STILL DOWN after wait budget $(date +%H:%M:%S)" \
            | tee -a /tmp/tpu_queue_status.log
        exit 1
    fi
    echo "tunnel down, retrying $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    sleep 300
done
echo "TUNNEL UP $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

# 1. PARITY GATE: Mosaic-compiled fused kernels vs XLA path, on chip.
#    Abort ONLY on a confirmed numeric FAIL (final "FAIL" marker in the
#    log). Infra failures — timeout rc=124, tunnel crash mid-probe — leave
#    no PASS/FAIL marker: retry once, then continue with a warning so one
#    hiccup doesn't forfeit the whole unattended measurement window.
parity_verdict() {  # prints pass|fail|inconclusive for the last parity log
    if tail -n 1 /tmp/q_parity.log 2>/dev/null | grep -qx "PASS"; then
        echo pass
    elif grep -q "^FAIL" /tmp/q_parity.log 2>/dev/null; then
        echo fail
    else
        echo inconclusive
    fi
}
run parity python scripts/tpu_parity_probe.py || true
v=$(parity_verdict)
if [ "$v" = inconclusive ]; then
    echo "parity inconclusive (infra) — one retry" \
        | tee -a /tmp/tpu_queue_status.log
    run parity python scripts/tpu_parity_probe.py || true
    v=$(parity_verdict)
fi
if [ "$v" = fail ]; then
    echo "PARITY FAILED — aborting queue (no number below is trustworthy)" \
        | tee -a /tmp/tpu_queue_status.log
    exit 2
elif [ "$v" = inconclusive ]; then
    echo "PARITY INCONCLUSIVE after retry — continuing, numbers below need" \
         "a parity rerun before being folded into BASELINE.md" \
        | tee -a /tmp/tpu_queue_status.log
fi

# 2. Driver bench contract (headline; validates all Swin changes).
run bench python bench.py

# 3. Stem conv vs tap-unfolded + depthwise grouped vs shift.
run stem python scripts/perf_probe_stem.py resnet medvit dw

# 4. ResNet / MedViT full train-step throughput with the new convs.
run arch python scripts/perf_probe_arch.py resnet-5c medvit-5c

# 5. Per-kernel fused halves (isolates softmax thinning).
run fused python scripts/perf_probe_fused.py

# 6. Inter-block glue: chain vs fused-corner formulation.
run glue python scripts/perf_probe_glue.py

# 7. Eval-matrix wall time: plain vs TTA rates, device-resident.
run eval python scripts/perf_probe_eval.py

# 7b. Pre-transformed resident store vs per-step resize+z-score (ViT-S
#     minimal config — the 44.1 ms deterministic-transform residual).
run pretransform python scripts/perf_probe_pretransform.py

# 8. A/B: window-resident stream off; corner glue.
run bench_wr0 env VSN_WINDOW_RESIDENT=0 python bench.py
run bench_glue_corner env VSN_GLUE=corner python bench.py

# 9. Micro-batch re-sweep with the leaner kernels.
run bench_micro16 env VSN_BENCH_MICRO=16 python bench.py
run bench_micro64 env VSN_BENCH_MICRO=64 python bench.py

echo "QUEUE COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
