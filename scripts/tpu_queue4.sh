#!/bin/bash
# Round-4 opening measurement queue. Fire this FIRST thing next session
# (before touching the compute path) so the chip measures while the
# session reads VERDICT/ADVICE:
#
#   setsid nohup bash scripts/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &
#   echo $! > /tmp/tpu_queue4.pid
#
# NEVER start a second TPU process while this runs (the axon tunnel
# serializes/crashes). Poll /tmp/tpu_queue_status.log.
#
# Queue rationale (BASELINE.md round-3 section):
# 1. Parity gate — any round-3-tail or round-4 kernel change must pass
#    on-chip fused-vs-unfused parity before numbers mean anything.
# 2. Headline reproduce — confirm 52.2 vol/s with current defaults
#    (guards against silent worker degradation / HBM-paging regressions).
# 3. Step-level A/B for the fused windows->windows glue kernel
#    (VSN_PALLAS_GLUE=1): isolated fwd wins all four junction types but
#    the stage2/shift adjoint regresses 5.90->9.74 ms — only a step-level
#    number decides the default. Flip the default in
#    ops/window_relayout.glue_kernel_active only if > headline and no
#    paging (watch for ~10-20x slowdown = HBM paging, not compute).
set -u
cd "$(dirname "$0")/.."

if [ -z "${VSN_QUEUE_DEADLINE+x}" ]; then
    VSN_QUEUE_DEADLINE=$(date -d "+8 hours" +%s)
fi
: "${VSN_QUEUE_TIMEOUT:=7200}"

past_deadline() {
    [ -n "${VSN_QUEUE_DEADLINE:-}" ] \
        && [ "$(date +%s)" -ge "$VSN_QUEUE_DEADLINE" ]
}

run() {
    local name=$1; shift
    if past_deadline; then
        echo "=== $name SKIPPED (deadline) $(date +%H:%M:%S)" \
            | tee -a /tmp/tpu_queue_status.log
        return 0
    fi
    echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q4_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE4 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

# 1. On-chip parity gate. Abort the queue if it fails — measurements on
#    top of wrong math are noise.
if ! run parity python scripts/tpu_parity_probe.py; then
    echo "QUEUE4 PARITY FAILED — aborting" | tee -a /tmp/tpu_queue_status.log
    exit 1
fi

# 2. Headline reproduce with round-3 defaults (expect ~52.2 vol/s).
run headline env VSN_BENCH_VERBOSE=1 python bench.py

# 3. Step-level glue-kernel A/B (expect: decide default from this).
run glue_ab env VSN_PALLAS_GLUE=1 VSN_BENCH_VERBOSE=1 python bench.py

echo "QUEUE4 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
