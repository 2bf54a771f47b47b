#!/usr/bin/env bash
# Batch-prediction front-end (reference predict.sh:2-92 counterpart).
set -euo pipefail

INPUT_DIR="${INPUT_DIR:?set INPUT_DIR}"
OUTPUT_DIR="${OUTPUT_DIR:-predictions}"
CKPT="${CKPT:?set CKPT}"
MODEL="${MODEL:-deeplabv3plus_resnet50}"
OUTPUT_STRIDE="${OUTPUT_STRIDE:-16}"
PRED_THRESHOLD="${PRED_THRESHOLD:-0.5}"
TILE_SIZE="${TILE_SIZE:-512}"
TILE_OVERLAP="${TILE_OVERLAP:-64}"

ARGS=(
  --input_dir "${INPUT_DIR}"
  --output_dir "${OUTPUT_DIR}"
  --ckpt "${CKPT}"
  --model "${MODEL}"
  --output_stride "${OUTPUT_STRIDE}"
  --pred_threshold "${PRED_THRESHOLD}"
  --tile_size "${TILE_SIZE}"
  --tile_overlap "${TILE_OVERLAP}"
)
[ "${SAVE_CONFIDENCE:-0}" = "1" ] && ARGS+=(--save_confidence)
[ "${SAVE_BINARY:-0}" = "1" ] && ARGS+=(--save_binary)
[ "${ENABLE_WAVE_PROCESSING:-0}" = "1" ] && ARGS+=(--enable_wave_processing)
[ -n "${EXTRA_ARGS:-}" ] && ARGS+=(${EXTRA_ARGS})

python -m iswm_tpu.cli.predict "${ARGS[@]}"
