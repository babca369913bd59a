#!/bin/bash
# Round-4 fifth measurement queue — fire AFTER tpu_queue7.sh completes:
#
#   setsid nohup bash scripts/tpu_queue8.sh > /tmp/tpu_queue8.log 2>&1 &
#
# The safe-softmax session: VSN_ATTN_ROWMAX replaces the fused kernels'
# absolute clamp at 80 with a rowmax-subtracted exp (exact softmax at any
# logit scale). The round-4 convergence artifact showed the flagship
# recipe reaches attn_logit_max 277.8 — past 80 the clamp both flattens
# the forward and zeroes the restoring gradient on the top logit, so
# exactness there is a correctness requirement, not a preference.
#
# 1. Parity gate on silicon with rowmax ON (fused-vs-unfused, incl. the
#    saturated-scale grad checks).
# 2. Step-level A/B: headline bench rowmax ON (new default) vs OFF
#    (legacy clamp). The default stays ON on correctness grounds unless
#    the cost is catastrophic; the A/B documents the price.
# 3. Convergence rerun with exact softmax -> canonical
#    artifacts/convergence_swin5c.jsonl (baseline recipe; logit growth is
#    the observed instability, finite + learning are the asserts).
# 4. Paired ENABLE_STABLE run -> artifacts/convergence_swin5c_stable.jsonl
#    (DeepScaleLM transforms must bound the logits < 80: the reference
#    project's central claim, reproduced on TPU).
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q8_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE8 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

run parity python scripts/tpu_parity_probe.py

run rowmax_on env VSN_BENCH_VERBOSE=1 python bench.py

run rowmax_off env VSN_ATTN_ROWMAX=0 VSN_BENCH_VERBOSE=1 python bench.py

run step_trace python scripts/perf_trace_model.py Step

run convergence timeout 7200 python scripts/convergence_run.py

run convergence_stable env VSN_CONV_STABLE=1 \
    timeout 7200 python scripts/convergence_run.py

echo "QUEUE8 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
