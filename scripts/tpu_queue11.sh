#!/bin/bash
# Round-5 third measurement queue — waits for queue10 (MedViT/ResNet
# split -> production fold -> headline bench), then:
#
#   setsid nohup bash scripts/tpu_queue11.sh > /tmp/tpu_queue11.log 2>&1 &
#
# 1. MedViT stage0 INTERNAL op split (VERDICT r4 #5): the fresh
#    whole-stage split (q10) confirms stage0 at ~42% of component time;
#    this ranks WHERE inside the ECB it goes (grouped MHCA conv vs LFF
#    depthwise vs the 1x1s) next to each op's analytic HBM floor, so the
#    closure note argues from data.
set -u
cd "$(dirname "$0")/.."

waited=0
until grep -q "QUEUE10 COMPLETE" /tmp/tpu_queue_status.log 2>/dev/null; do
    if [ "$waited" -ge 14400 ]; then
        # NEVER fall through to TPU work: the predecessor may still hold
        # the chip (two TPU processes crash the tunnel — CLAUDE.md).
        echo "QUEUE11 ABORT: queue10 never completed" \
            | tee -a /tmp/tpu_queue_status.log
        exit 1
    fi
    sleep 10; waited=$((waited + 10))
done

run() {
    local name=$1; shift
    echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    timeout 3600 "$@" > "/tmp/q11_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE11 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run stage0_split python scripts/perf_probe_stage0_split.py

echo "QUEUE11 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
