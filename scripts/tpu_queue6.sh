#!/bin/bash
# Round-4 third measurement queue — after the convergence-run divergence
# was root-caused to the (u, r)-basis attention backward breaking in the
# saturated regime (r^2 f32 underflow past sum(exp) ~1e19 drops the
# softmax projection term -> wrong grads -> logit runaway; u*dp inf
# overflow past the clamp at 80 -> NaN). The backward was rewritten in
# the bounded p-basis (ops/swin_block_kernels._heads_attention_bwd);
# regression test tests/test_swin_block_kernels.py::
# test_fused_attn_grads_at_saturation.
#
#   setsid nohup bash scripts/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &
#
# 1. Parity gate — the rewritten backward must pass fused-vs-unfused
#    on silicon before any number means anything.
# 2. Headline reproduce — the p-basis form has the same [N,N]-pass count
#    as the (u,r) form on paper; confirm 54.3 vol/s survives.
# 3. Convergence rerun — the round's must-have artifact (VERDICT r3 #3):
#    400 full-stack steps, loss must fall, grads stay finite,
#    attn_logit_max must keep margin vs the clamp at 80.
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
    timeout "$VSN_QUEUE_TIMEOUT" "$@" > "/tmp/q6_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc end $(date +%H:%M:%S)" \
        | tee -a /tmp/tpu_queue_status.log
    return $rc
}

echo "QUEUE6 START $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

if ! run parity python scripts/tpu_parity_probe.py; then
    echo "QUEUE6 PARITY FAILED — aborting" | tee -a /tmp/tpu_queue_status.log
    exit 1
fi

run headline env VSN_BENCH_VERBOSE=1 python bench.py

run convergence python scripts/convergence_run.py

echo "QUEUE6 COMPLETE $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
