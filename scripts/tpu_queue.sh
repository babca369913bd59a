#!/bin/bash
# Measurement queue for when the axon TPU tunnel comes back.
# Runs probes SEQUENTIALLY (never two TPU processes at once) with generous
# timeouts; each writes its own log under /tmp/q_*.log.
#
# Usage: setsid nohup bash scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
    local name=$1; shift
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

# 1. Stem conv vs tap-unfolded + depthwise grouped vs shift (the new ops).
run stem python scripts/perf_probe_stem.py resnet medvit dw

# 2. ResNet / MedViT full train-step throughput with the new conv paths.
run arch python scripts/perf_probe_arch.py resnet-5c medvit-5c

# 3. Inter-block relayout glue: chain vs fused-corner formulation.
run glue python scripts/perf_probe_glue.py

# 4. Eval-matrix wall time: plain vs TTA eval rates, device-resident.
run eval python scripts/perf_probe_eval.py

# 4b. Per-kernel fused halves (isolates the softmax-thinning effect).
run fused python scripts/perf_probe_fused.py

# 5. Driver bench contract (Swin full stack) — confirms no regression.
run bench python bench.py

# 6. A/B the new kernel-softmax + window-resident stream at step level.
run bench_wr0 env VSN_WINDOW_RESIDENT=0 python bench.py
run bench_glue_corner env VSN_GLUE=corner python bench.py

# 7. Micro-batch re-sweep with the leaner kernels (fewer VPU passes free
#    VMEM/HBM headroom; optimum may have moved past 32).
run bench_micro16 env VSN_BENCH_MICRO=16 python bench.py
run bench_micro64 env VSN_BENCH_MICRO=64 python bench.py
