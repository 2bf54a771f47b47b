#!/bin/bash
# Round-4 blockdiag accuracy A/B (VERDICT r3 ask 1a).
#
# grouped_blockdiag executes narrow grouped convs as block-diagonal dense
# convs with bit-identical math (tests/test_models.py pins logit equality),
# so this same-seed pair mostly guards the full-loop interaction (retrace,
# int8 composition, optimizer state layout) rather than the arithmetic.
# resnext50_32x4d, IW-CE synthetic @200²/bs32, 1500 iters, same seed:
# auto (gate 256, the new default) vs --grouped_blockdiag 0 (off).
#
# ONE TPU job at a time (CLAUDE.md).  Log: /tmp/r4_blockdiag_ab.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_blockdiag_ab.log
OUT=/tmp/blockdiag_ab
mkdir -p "$OUT"
date | tee -a "$LOG"

for gate in -1 0; do   # -1 = auto (256 on resnext), 0 = off
  tag="bd${gate}"
  echo "=== resnext50_32x4d grouped_blockdiag=$gate ===" | tee -a "$LOG"
  timeout 7200 python -m iswm_tpu.cli.train \
    --synthetic --data_root "$OUT/data" \
    --model deeplabv3plus_resnext50_32x4d --output_stride 16 \
    --crop_size 200 --batch_size 32 --loss_type IWce_loss \
    --total_itrs 1500 --val_interval 500 --print_interval 100 \
    --random_seed 1 --grouped_blockdiag "$gate" \
    --checkpoints_dir "$OUT/$tag/ckpt" \
    --val_results_dir "$OUT/$tag/val" \
    --log_dir "$OUT/$tag/logs" \
    --val_dump_limit 1 \
    2>&1 | tail -4 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "FAILED ($tag, rc=$rc)" | tee -a "$LOG"
    exit "$rc"
  fi
done
date | tee -a "$LOG"
