#!/usr/bin/env bash
# Run train_eval.sh over every fold, aborting everything on first failure.
# Equivalent of reference scripts/transformer_folds.sh (its setsid
# process-group + NCCL-cooldown machinery is unnecessary without torchrun:
# one JAX process per fold, cleanly sequential).
set -euo pipefail

KFOLD=10
FOLD_START=0
PASSTHROUGH=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --kfold)      KFOLD="$2"; shift 2;;
    --fold-start) FOLD_START="$2"; shift 2;;
    *) PASSTHROUGH+=("$1"); shift;;
  esac
done

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
for ((fold=FOLD_START; fold<KFOLD; fold++)); do
  echo "================ fold ${fold}/$((KFOLD-1)) ================"
  "${SCRIPT_DIR}/train_eval.sh" --fold "$fold" "${PASSTHROUGH[@]}" \
    || { echo "fold ${fold} failed; aborting" >&2; exit 1; }
done
echo "all ${KFOLD} folds complete"
