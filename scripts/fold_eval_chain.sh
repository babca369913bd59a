#!/bin/bash
# Best-N -> TTA-eval -> ensemble -> calibration -> results-table chain on
# the silicon fold's checkpoints (the second half of train_fold_silicon.py,
# runnable standalone when the fold's own chain was interrupted):
#
#   setsid nohup bash scripts/fold_eval_chain.sh > /tmp/fold_eval_chain.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
W=${VSN_FOLD_WORK:-/tmp/fold_silicon}

t0=$(date +%s)
timeout 3600 python -m vsn_tpu.eval.evaluate \
  --checkpoints "$W"/runs/model_silicon_0_best*.ckpt \
  --training-csv-dir "$W/id/folds" \
  --intermediate-dir "$W/cache" \
  --output-dir "$W/runs/predictions" --use-tta
echo "TTA_EVAL_S $(($(date +%s)-t0))"
t1=$(date +%s)
python -m vsn_tpu.viz.ensemble --run "swin=$W/runs/predictions" \
  --output-dir "$W/viz" --num-bootstrap 200
echo "ENSEMBLE_S $(($(date +%s)-t1))"
t2=$(date +%s)
python -m vsn_tpu.eval.calibrate_predictions --model-dir "$W/runs/predictions" \
  --output-dir "$W/calibrated" --val-fold all --method temperature
echo "CALIB_S $(($(date +%s)-t2))"
t3=$(date +%s)
python -m vsn_tpu.eval.results_table --metrics-dirs "$W/runs/predictions" \
  --output "$W/results_table.csv"
echo "TABLE_S $(($(date +%s)-t3))"
echo "EVAL CHAIN OK total $(($(date +%s)-t0))s"
