#!/usr/bin/env bash
# Train + evaluate the SVM baseline (equivalent of reference scripts/svm.sh,
# without the conda-env activation).
set -euo pipefail

TRAINING_CSV_DIR="" SAVE_DIR="" INTERMEDIATE_DIR="" EVAL_CSV="" FOLD=0
N_TRIALS=100 METRIC="bacc" RUNNAME="" DISEASES=("CN" "AD" "PNFA" "BV" "SD")

while [[ $# -gt 0 ]]; do
  case "$1" in
    --training-csv-dir) TRAINING_CSV_DIR="$2"; shift 2;;
    --save-dir)         SAVE_DIR="$2"; shift 2;;
    --intermediate-dir) INTERMEDIATE_DIR="$2"; shift 2;;
    --eval-csv)         EVAL_CSV="$2"; shift 2;;
    --fold)             FOLD="$2"; shift 2;;
    --n-trials)         N_TRIALS="$2"; shift 2;;
    --metric)           METRIC="$2"; shift 2;;
    --runname)          RUNNAME="$2"; shift 2;;
    --diseases)         shift; DISEASES=(); while [[ $# -gt 0 && "$1" != --* ]]; do DISEASES+=("$1"); shift; done;;
    *) echo "unknown flag: $1" >&2; exit 1;;
  esac
done
for req in TRAINING_CSV_DIR SAVE_DIR INTERMEDIATE_DIR; do
  [[ -n "${!req}" ]] || { echo "--$(echo $req | tr 'A-Z_' 'a-z-') is required" >&2; exit 1; }
done

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"

ARGS=(--training-csv-dir "$TRAINING_CSV_DIR" --save-dir "$SAVE_DIR"
      --intermediate-dir "$INTERMEDIATE_DIR" --fold "$FOLD"
      --n-trials "$N_TRIALS" --metric "$METRIC" --diseases "${DISEASES[@]}")
[[ -n "$RUNNAME" ]] && ARGS+=(--runname "$RUNNAME")
python -m vsn_tpu.svm.train "${ARGS[@]}"

EVAL_ARGS=(--model-dir "$SAVE_DIR" --training-csv-dir "$TRAINING_CSV_DIR"
           --intermediate-dir "$INTERMEDIATE_DIR"
           --output-dir "${SAVE_DIR}/predictions" --diseases "${DISEASES[@]}")
[[ -n "$EVAL_CSV" ]] && EVAL_ARGS+=(--eval-csv "$EVAL_CSV")
python -m vsn_tpu.svm.evaluate "${EVAL_ARGS[@]}"
