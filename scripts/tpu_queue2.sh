#!/bin/bash
# Follow-up measurement queue: the stem/arch/eval entries of the round-3
# main queue (scripts/tpu_queue.sh) failed — stem/arch on the tap-unfold
# compile OOM (now replaced by the Pallas im2col stem), eval on a config
# lookup bug (fixed). This queue re-measures them with the fixes in.
#
# It WAITS for the main queue's completion marker so two TPU processes
# never overlap (the tunnel serializes/crashes otherwise).
#
# Usage: setsid nohup bash scripts/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

# 0. Wait for the main queue to finish: its terminal marker line, or —
#    if VSN_MAIN_QUEUE_PID is set — that process exiting abnormally.
while :; do
    if grep -q "QUEUE COMPLETE\|PARITY FAILED\|DEADLINE before\|STILL DOWN" \
        /tmp/tpu_queue_status.log 2>/dev/null; then
        break
    fi
    if [ -n "${VSN_MAIN_QUEUE_PID:-}" ] \
        && [ ! -d "/proc/${VSN_MAIN_QUEUE_PID}" ]; then
        break
    fi
    if past_deadline; then
        echo "QUEUE2: deadline while waiting for main queue" \
            | tee -a /tmp/tpu_queue_status.log
        exit 1
    fi
    sleep 60
done
echo "QUEUE2 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

# 1. Stem kernel on chip: Mosaic-compile gate + parity assert + timing
#    (conv vs Pallas im2col, fwd/dx/dw/full; then depthwise shift-FMA).
run stem2 python scripts/perf_probe_stem.py resnet medvit dw

# 2. ResNet / MedViT full train step with the im2col stems.
run arch2 python scripts/perf_probe_arch.py resnet-5c medvit-5c

# 3. Eval-matrix rates (plain + TTA), device-resident (probe fixed).
run eval2 python scripts/perf_probe_eval.py

echo "QUEUE2 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
