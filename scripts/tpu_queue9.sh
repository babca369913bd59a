#!/bin/bash
# Round-5 first measurement queue — fire when the chip is free:
#
#   setsid nohup bash scripts/tpu_queue9.sh > /tmp/tpu_queue9.log 2>&1 &
#
# 1. LayerScale convergence arm (VERDICT r4 #2: the third stabilizer arm
#    against the same swin-5c instability recipe; baseline peaked at
#    attn_logit_max 277.8, ENABLE_STABLE at 133.0).
# 2. TTA eval batch sweep (VERDICT r4 #6: plain eval got a sweep with the
#    knee at 64; TTA-8 was only ever measured at underlying batch 8 =
#    32.7 vol/s). tta:32 (256 effective rows at full geometry) runs LAST —
#    it is the HBM-riskiest config and a worker crash must not cost the
#    earlier points.
set -u
cd "$(dirname "$0")/.."

if [ -z "${VSN_QUEUE_DEADLINE+x}" ]; then
    VSN_QUEUE_DEADLINE=$(date -d "+4 hours" +%s)
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q9_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE9 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run convergence_layerscale env VSN_CONV_ARM=layerscale \
    timeout 7200 python scripts/convergence_run.py

run tta_sweep_8_16 env VSN_EVAL_SWEEP="tta:8,tta:16" \
    timeout 3600 python scripts/perf_probe_eval.py

run tta_sweep_32 env VSN_EVAL_SWEEP="tta:32" \
    timeout 3600 python scripts/perf_probe_eval.py

echo "QUEUE9 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
