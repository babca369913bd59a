#!/bin/bash
# Round-4 fourth measurement queue — fire AFTER tpu_queue6.sh completes
# (headline reproduce on the p-basis backward + convergence rerun):
#
#   setsid nohup bash scripts/tpu_queue7.sh > /tmp/tpu_queue7.log 2>&1 &
#
# 1. Device trace of the full train step at the CURRENT default stack
#    (glue + s2w + p-basis backward) — top-op self-times pick the next
#    kernel target by measured share, not intuition (MFU table says the
#    swin step runs at 18-19% executed-FLOP utilization; the trace says
#    where the other 80% goes NOW).
# 2. micro 64 / accum 2 step-level A/B: the 32/4 default was chosen at
#    the 39.9 stack; three kernel generations later the VMEM/HBM
#    balance has moved (fused VJPs recompute, relayouts gone) — a
#    bigger micro may fit and win. Watch for the paging signature
#    (~10-20x slowdown) and treat OOM/crash as a NO.
# 3. TTA eval batch sweep (16/32): q5 measured TTA only at batch 8
#    (32.7 vol/s); TTA dominates the 10-fold eval matrix wall-clock.
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q7_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE7 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run trace python scripts/perf_trace_model.py Swin

run micro64 env VSN_BENCH_MICRO=64 VSN_BENCH_VERBOSE=1 python bench.py

run tta_sweep env VSN_EVAL_SWEEP=tta:16,tta:32 python scripts/perf_probe_eval.py

echo "QUEUE7 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
