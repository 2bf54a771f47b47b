#!/usr/bin/env bash
# Env-var front-end for CE-loss training, the shell-orchestration layer the
# reference exposes (reference scripts/training/run_ce_loss.sh:41-116):
# every knob is an env var with a default; the script assembles the CLI
# call, tees a log, and snapshots the effective config.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./datasets/data}"
MODEL="${MODEL:-deeplabv3plus_resnet50}"
OUTPUT_STRIDE="${OUTPUT_STRIDE:-16}"
CROP_SIZE="${CROP_SIZE:-200}"
BATCH_SIZE="${BATCH_SIZE:-32}"
VAL_BATCH_SIZE="${VAL_BATCH_SIZE:-4}"
LR="${LR:-0.001}"
OPTIMIZER="${OPTIMIZER:-sgd}"
WEIGHT_DECAY="${WEIGHT_DECAY:-1e-4}"
TOTAL_ITRS="${TOTAL_ITRS:-30000}"
VAL_INTERVAL="${VAL_INTERVAL:-500}"
PRINT_INTERVAL="${PRINT_INTERVAL:-10}"
LOSS_TYPE="${LOSS_TYPE:-ce_loss}"
SEQUENCE_LENGTH="${SEQUENCE_LENGTH:-7}"
RANDOM_SEED="${RANDOM_SEED:-1}"
RUN_DIR="${RUN_DIR:-runs/$(date +%Y%m%d_%H%M%S)_${LOSS_TYPE}}"

mkdir -p "${RUN_DIR}"
ARGS=(
  --data_root "${DATA_ROOT}"
  --model "${MODEL}"
  --output_stride "${OUTPUT_STRIDE}"
  --crop_size "${CROP_SIZE}"
  --batch_size "${BATCH_SIZE}"
  --val_batch_size "${VAL_BATCH_SIZE}"
  --lr "${LR}"
  --optimizer "${OPTIMIZER}"
  --weight_decay "${WEIGHT_DECAY}"
  --total_itrs "${TOTAL_ITRS}"
  --val_interval "${VAL_INTERVAL}"
  --print_interval "${PRINT_INTERVAL}"
  --loss_type "${LOSS_TYPE}"
  --sequence_length "${SEQUENCE_LENGTH}"
  --random_seed "${RANDOM_SEED}"
  --checkpoints_dir "${RUN_DIR}/checkpoints"
  --val_results_dir "${RUN_DIR}/val_results"
  --metrics_plots_dir "${RUN_DIR}/plots"
)
[ -n "${EXTRA_ARGS:-}" ] && ARGS+=(${EXTRA_ARGS})

printf '%s\n' "config snapshot: ${ARGS[*]}" > "${RUN_DIR}/config.txt"
python -m iswm_tpu.cli.train "${ARGS[@]}" 2>&1 | tee "${RUN_DIR}/train.log"
