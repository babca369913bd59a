#!/bin/bash
# Measurement queue for when the axon TPU tunnel comes back.
# Runs probes SEQUENTIALLY (never two TPU processes at once) with generous
# timeouts; each writes its own log under /tmp/q_*.log.
#
# Usage: setsid nohup bash scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# Default deadline for this round's driver bench window (overridable).
: "${VSN_QUEUE_DEADLINE:=$(date -d "2026-08-18 09:30" +%s 2>/dev/null || echo 9999999999)}"

run() {
    local name=$1; shift
    # Hard deadline (VSN_QUEUE_DEADLINE, epoch secs): never let a queue
    # entry overlap the driver's own end-of-round bench run — two TPU
    # processes crash the tunnel.
    if [ -n "${VSN_QUEUE_DEADLINE:-}" ] \
            && [ "$(date +%s)" -ge "$VSN_QUEUE_DEADLINE" ]; then
        echo "=== $name SKIPPED (deadline) $(date +%H:%M:%S)" \
            | tee -a /tmp/tpu_queue_status.log
        return 0
    fi
    echo "=== $name start $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    timeout 2400 "$@" > "/tmp/q_${name}.log" 2>&1
    echo "=== $name rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
}

# 0. Tiny liveness check first; bail out early if the tunnel is still down.
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()), jax.devices())
" > /tmp/q_alive.log 2>&1
if [ $? -ne 0 ]; then
    echo "TUNNEL STILL DOWN $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log
    exit 1
fi
echo "TUNNEL UP $(date +%H:%M:%S)" | tee -a /tmp/tpu_queue_status.log

# 1. Driver bench contract (headline; validates all Swin changes).
run bench python bench.py

# 2. Stem conv vs tap-unfolded + depthwise grouped vs shift.
run stem python scripts/perf_probe_stem.py resnet medvit dw

# 3. ResNet / MedViT full train-step throughput with the new convs.
run arch python scripts/perf_probe_arch.py resnet-5c medvit-5c

# 4. Per-kernel fused halves (isolates softmax thinning).
run fused python scripts/perf_probe_fused.py

# 5. Inter-block glue: chain vs fused-corner formulation.
run glue python scripts/perf_probe_glue.py

# 6. Eval-matrix wall time: plain vs TTA rates, device-resident.
run eval python scripts/perf_probe_eval.py

# 7. A/B: window-resident stream off; corner glue.
run bench_wr0 env VSN_WINDOW_RESIDENT=0 python bench.py
run bench_glue_corner env VSN_GLUE=corner python bench.py

# 8. Micro-batch re-sweep with the leaner kernels.
run bench_micro16 env VSN_BENCH_MICRO=16 python bench.py
run bench_micro64 env VSN_BENCH_MICRO=64 python bench.py
