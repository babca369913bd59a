#!/bin/bash
# Round-4 second measurement queue (after tpu_queue4.sh decided the glue
# default ON at 54.275 vol/s):
#
#   setsid nohup bash scripts/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &
#
# 1. Convergence/stability artifact (VERDICT #3): 400 full-stack steps,
#    per-step loss/grad_norm/attn_logit_max -> artifacts/
#    convergence_swin5c.jsonl. Runs FIRST: it is the round's one
#    must-have artifact.
# 2. Eval batch sweep (VERDICT #5): plain eval at batch 8/32/64/128 +
#    TTA, with the new one-batch-deep dispatch pipeline.
# 3. Step-level A/B for the Pallas entry partition (VSN_PALLAS_S2W=1).
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q5_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE5 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run convergence python scripts/convergence_run.py
run eval_sweep python scripts/perf_probe_eval.py
run s2w_ab env VSN_PALLAS_S2W=1 VSN_BENCH_VERBOSE=1 python bench.py

echo "QUEUE5 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
