#!/usr/bin/env bash
# Full reference-protocol rehearsal on synthetic data (VERDICT r3 #7):
# one command composing every stage the reference's production pipeline
# chains — k-fold training loop -> best-N checkpoints -> TTA eval (ID +
# OD cohorts, bootstrap metrics, prediction CSVs) -> snapshot-ensemble
# violin/summary -> leave-one-out temperature calibration + calibrated
# ensemble -> results table — and asserts the artifact tree.
#
# Mirrors /root/reference/scripts/transformer_folds.sh +
# /root/reference/utils/calibrate_predictions.py:420-661 at CI scale:
# tiny Swin geometry, 3 folds, CPU (8 virtual devices), ~minutes.
#
# Usage:  bash scripts/protocol_rehearsal.sh [workdir]
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d /tmp/protocol_rehearsal.XXXX)}"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
cd "$REPO_ROOT"
echo "[rehearsal] workdir: $WORK"

# ---- 1. synthetic cohorts: ID (k-fold) + OD ---------------------------
python - "$WORK" <<'EOF'
import sys
from vsn_tpu.data.synthetic import generate_synthetic_dataset
work = sys.argv[1]
generate_synthetic_dataset(
    f"{work}/id", n_subjects=24, shape=(20, 24, 20),
    diseases=("CN", "AD", "FTD"), kfold=3, seed=11)
generate_synthetic_dataset(
    f"{work}/od", n_subjects=9, shape=(20, 24, 20),
    diseases=("CN", "AD", "FTD"), kfold=3, seed=23,
    dataset_name="SYNTHOD")
EOF

# ---- 2. tiny Swin config (the swin-5c protocol shape, CI geometry) ----
cat > "$WORK/config.yaml" <<'YAML'
ARCHITECTURE: Swin
IMG_SIZE: [16, 16, 16]
RESHAPE_SIZE: false
PATCH_SHAPE: [2, 2, 2]
EMBED_DIM: 16
DEPTH: [1, 1]
HEADS: [2, 4]
WINDOW_SIZE: [2, 2, 2]
DISEASES: [CN, AD, FTD]
KFOLD: 3
SPLIT: [1, 1, 1]
BATCH_SIZE: 1
EFFECTIVE_BATCH_SIZE: 16
EVAL_BATCH_SIZE: 16
STEPS: 8
LR_WARMUP: 2
WD_WARMUP: 2
VALIDATION_FREQUENCY: 4
KEEP_BEST_N: 2
EARLY_STOPPING_PATIENCE: false
USE_SAM: true
USE_EMA: true
USE_MIXUP: true
MIXUP_PROB: 0.5
LABEL_SMOOTHING: 0.1
FP16: false
SEED: 5
YAML

# ---- 3. k-fold train + best-N TTA eval (ID + OD) ----------------------
bash scripts/train_folds.sh --kfold 3 \
  --training-csv-dir "$WORK/id/folds" \
  --save-dir "$WORK/runs" \
  --intermediate-dir "$WORK/cache" \
  --config "$WORK/config.yaml" \
  --eval-csv "$WORK/od/folds/fold_0.csv" \
  --use-tta --seed 5

PRED="$WORK/runs/predictions"

# ---- 4. snapshot-ensemble violin / summary ----------------------------
python -m vsn_tpu.viz.ensemble \
  --run "swin=$PRED" --output-dir "$WORK/viz" \
  --num-bootstrap 200

# ---- 5. leave-one-out temperature calibration + calibrated ensemble ---
python -m vsn_tpu.eval.calibrate_predictions \
  --model-dir "$PRED" --output-dir "$WORK/calibrated" \
  --val-fold all --method temperature

# ---- 6. results table across checkpoints ------------------------------
python -m vsn_tpu.eval.results_table \
  --metrics-dirs "$PRED" --output "$WORK/results_table.csv"

# ---- 7. assert the artifact tree ---------------------------------------
python - "$WORK" <<'EOF'
import sys
from pathlib import Path
work = Path(sys.argv[1])
required = [
    "runs/predictions",
    "viz/violin_balanced_accuracy.png",
    "viz/confusion_swin.png",
    "viz/dashboard.png",
    "viz/summary.csv",
    "calibrated/all_folds_calibration_results.csv",
    "calibrated/ensemble",
    "results_table.csv",
]
missing = [r for r in required if not (work / r).exists()]
assert not missing, f"missing artifacts: {missing}"
for fold in range(3):
    ids = list((work / "runs/predictions").glob(f"*_{fold}_best*_id.csv"))
    ods = list((work / "runs/predictions").glob(f"*_{fold}_best*_od.csv"))
    assert ids, f"fold {fold}: no ID prediction CSVs"
    assert ods, f"fold {fold}: no OD prediction CSVs"
lasts = list((work / "runs").glob("model_*_last.ckpt"))
bests = list((work / "runs").glob("model_*_best*.ckpt"))
assert len(lasts) == 3 and len(bests) >= 3, (lasts, bests)
print("PROTOCOL REHEARSAL OK:", work)
EOF
