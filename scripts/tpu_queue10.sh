#!/bin/bash
# Round-5 second measurement queue — waits for queue9 (TTA sweep) to
# finish, then:
#
#   setsid nohup bash scripts/tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
#
# 1. Fresh MedViT/ResNet stage split at current defaults (VERDICT r4 #5:
#    the 114.8 ms "stage0 = 41%" figure is a ROUND-2 number predating the
#    im2col stem, relayout kernels, and arch re-measurements; the closure
#    note must rank today's costs, not 2-round-old ones).
# 2. The production-recipe fold through the real train_fold (VERDICT r4
#    #3): 2,500 steps, val-every-5 with EMA, best-10, early-stop 300,
#    synthetic 320-subject cohort at production geometry, device-resident.
#    Tunnel knobs per trainer.py: last-checkpoint every 100 validations,
#    eval-only best-N payloads (the first 'last' save still measures a
#    full-state fetch).
# 3. Headline bench at production defaults (round-5 closing number).
set -u
cd "$(dirname "$0")/.."

waited=0
until grep -q "QUEUE9 COMPLETE" /tmp/tpu_queue_status.log 2>/dev/null; do
    if [ "$waited" -ge 7200 ]; then
        # NEVER fall through to TPU work: the predecessor may still hold
        # the chip (two TPU processes crash the tunnel — CLAUDE.md).
        echo "QUEUE10 ABORT: queue9 never completed" \
            | tee -a /tmp/tpu_queue_status.log
        exit 1
    fi
    sleep 10; waited=$((waited + 10))
done

: "${VSN_QUEUE_TIMEOUT:=14400}"

run() {
    local name=$1; shift
    echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q10_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE10 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run medvit_resnet_split timeout 3600 python scripts/perf_probe_medvit_resnet.py

run fold_silicon env VSN_CKPT_LAST_EVERY=100 VSN_BESTN_EVAL_ONLY=1 \
    timeout 14400 python scripts/train_fold_silicon.py

run headline env VSN_BENCH_VERBOSE=1 timeout 3600 python bench.py

echo "QUEUE10 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
