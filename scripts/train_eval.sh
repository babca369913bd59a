#!/usr/bin/env bash
# Train one fold then evaluate its best checkpoints.
#
# Equivalent of reference scripts/transformer.sh: same public flags; instead
# of torchrun process-per-GPU, a single JAX process drives the whole device
# mesh (SPMD), so no launcher is needed. With --eval-parallel N the best-N
# checkpoints are sharded across N background eval processes with
# signal-based cleanup (reference transformer.sh:242-266 behavior; device
# pinning comes from the environment, e.g. TPU_VISIBLE_DEVICES per process
# on a multi-chip host — keep N=1 on single-chip or tunneled setups).
set -euo pipefail

TRAINING_CSV_DIR="" SAVE_DIR="" INTERMEDIATE_DIR="" RUNNAME="" EVAL_CSV=""
CONFIG="" FOLD=0 CHECKPOINT="" SEED="__unset__" USE_TTA="" MAX_STEPS=""
EVAL_PARALLEL=1

while [[ $# -gt 0 ]]; do
  case "$1" in
    --training-csv-dir) TRAINING_CSV_DIR="$2"; shift 2;;
    --save-dir)         SAVE_DIR="$2"; shift 2;;
    --intermediate-dir) INTERMEDIATE_DIR="$2"; shift 2;;
    --runname)          RUNNAME="$2"; shift 2;;
    --eval-csv)         EVAL_CSV="$2"; shift 2;;
    --config)           CONFIG="$2"; shift 2;;
    --fold)             FOLD="$2"; shift 2;;
    --checkpoint)       CHECKPOINT="$2"; shift 2;;
    --seed)             SEED="$2"; shift 2;;
    --use-tta)          USE_TTA="--use-tta"; shift;;
    --max-steps)        MAX_STEPS="$2"; shift 2;;
    --eval-parallel)    EVAL_PARALLEL="$2"; shift 2;;
    *) echo "unknown flag: $1" >&2; exit 1;;
  esac
done

for req in TRAINING_CSV_DIR SAVE_DIR INTERMEDIATE_DIR; do
  [[ -n "${!req}" ]] || { echo "--$(echo $req | tr 'A-Z_' 'a-z-') is required" >&2; exit 1; }
done

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
RUNNAME="${RUNNAME:-$(python - <<'EOF'
import uuid; print(uuid.uuid4().hex[:8])
EOF
)}"

TRAIN_ARGS=(--training-csv-dir "$TRAINING_CSV_DIR" --save-dir "$SAVE_DIR"
            --intermediate-dir "$INTERMEDIATE_DIR" --fold "$FOLD"
            --runname "$RUNNAME" --seed "$SEED")
[[ -n "$CONFIG" ]] && TRAIN_ARGS+=(--config "$CONFIG")
[[ -n "$CHECKPOINT" ]] && TRAIN_ARGS+=(--checkpoint "$CHECKPOINT")
[[ -n "$MAX_STEPS" ]] && TRAIN_ARGS+=(--max-steps "$MAX_STEPS")

echo "[train_eval] training run ${RUNNAME} fold ${FOLD}"
python -m vsn_tpu.train.cli "${TRAIN_ARGS[@]}"

mapfile -t BEST < <(ls "${SAVE_DIR}"/model_"${RUNNAME}"_"${FOLD}"_best*.ckpt 2>/dev/null | sort)
if [[ ${#BEST[@]} -eq 0 ]]; then
  echo "[train_eval] no best checkpoints found for ${RUNNAME} fold ${FOLD}" >&2
  exit 1
fi
COMMON_EVAL_ARGS=(--training-csv-dir "$TRAINING_CSV_DIR"
                  --intermediate-dir "$INTERMEDIATE_DIR"
                  --output-dir "${SAVE_DIR}/predictions" $USE_TTA)
[[ -n "$EVAL_CSV" ]] && COMMON_EVAL_ARGS+=(--eval-csv "$EVAL_CSV")

if [[ "$EVAL_PARALLEL" -le 1 || ${#BEST[@]} -le 1 ]]; then
  echo "[train_eval] evaluating ${#BEST[@]} checkpoints sequentially"
  python -m vsn_tpu.eval.evaluate --checkpoints "${BEST[@]}" \
    "${COMMON_EVAL_ARGS[@]}"
else
  # shard checkpoints round-robin across background eval processes
  # (reference transformer.sh:242-266); kill the group on any signal
  N=$(( EVAL_PARALLEL < ${#BEST[@]} ? EVAL_PARALLEL : ${#BEST[@]} ))
  echo "[train_eval] evaluating ${#BEST[@]} checkpoints across ${N} processes"
  PIDS=()
  cleanup() { for p in "${PIDS[@]}"; do kill "$p" 2>/dev/null || true; done; }
  trap cleanup INT TERM
  for (( w=0; w<N; w++ )); do
    SHARD=()
    for (( i=w; i<${#BEST[@]}; i+=N )); do SHARD+=("${BEST[$i]}"); done
    python -m vsn_tpu.eval.evaluate --checkpoints "${SHARD[@]}" \
      "${COMMON_EVAL_ARGS[@]}" &
    PIDS+=($!)
  done
  FAIL=0
  for p in "${PIDS[@]}"; do wait "$p" || FAIL=1; done
  trap - INT TERM
  [[ $FAIL -eq 0 ]] || { echo "[train_eval] an eval shard failed" >&2; exit 1; }
fi
