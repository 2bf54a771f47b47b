#!/usr/bin/env bash
# Pre-augmented-dataset CE experiment (reference
# scripts/training/run_dataug_f_ce.sh): identical to run_ce_loss.sh except
# it points at the "Experiment F" augmented dataset tree and the larger
# batch the reference used for it (128).  All knobs remain env-vars.
set -euo pipefail
export DATA_ROOT="${DATA_ROOT:-./Aug_datasets/Experiment_F}"
export BATCH_SIZE="${BATCH_SIZE:-128}"
export LOSS_TYPE="ce_loss"
export RUN_DIR="${RUN_DIR:-runs/$(date +%Y%m%d_%H%M%S)_augf_ce}"
exec "$(dirname "$0")/run_ce_loss.sh"
