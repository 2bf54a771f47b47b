#!/bin/bash
# Round-4 multi-seed int8_bwd accuracy study (VERDICT r3 ask 4).
#
# The r3 claim (−0.0075 best-weighted for --int8_training 256 --int8_bwd)
# was ONE same-seed draw from a run whose own checkpoint-to-checkpoint
# swing is ±0.07.  This runs >=3 seeds of the same-seed pair at the r3
# geometry (IW-CE synthetic @200²/bs32, 3000 iters, val every 500) plus
# one pair at the reference's CE train geometry (run_ce_loss.sh:42-55),
# and reports per-seed best-weighted deltas.
#
# ONE TPU job at a time; host idle during runs (CLAUDE.md).  Every run
# writes under /tmp/ab_r4/<tag>/ — parse with scripts/r4_int8_ab_parse.py.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_int8_ab.log
OUT=/tmp/ab_r4
mkdir -p "$OUT"

train_pair() {  # $1 = seed, $2 = loss_type
  seed=$1; loss=$2
  for mode in bf16 int8; do
    tag="${loss}_s${seed}_${mode}"
    extra=""
    if [ "$mode" = int8 ]; then extra="--int8_training 256 --int8_bwd 1"; fi
    echo "=== $tag ===" | tee -a "$LOG"
    # same --data_root for both arms of a seed (fixture written once by
    # the first arm, seed-stamped); distinct roots across seeds so the
    # fixture actually varies
    timeout 7200 python -m iswm_tpu.cli.train \
      --synthetic --data_root "$OUT/data_s${seed}" \
      --model deeplabv3plus_resnet50 --output_stride 16 \
      --crop_size 200 --batch_size 32 --loss_type "$loss" \
      --total_itrs 3000 --val_interval 500 --print_interval 100 \
      --random_seed "$seed" $extra \
      --checkpoints_dir "$OUT/$tag/ckpt" \
      --val_results_dir "$OUT/$tag/val" \
      --log_dir "$OUT/$tag/logs" \
      --val_dump_limit 1 \
      2>&1 | tail -4 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
    if [ "$rc" -ne 0 ]; then
      echo "FAILED ($tag, rc=$rc) — aborting" | tee -a "$LOG"
      exit "$rc"
    fi
  done
}

date | tee -a "$LOG"
# 3 seeds at the r3 geometry (IW-CE @200²/bs32)
train_pair 1 IWce_loss
train_pair 2 IWce_loss
train_pair 3 IWce_loss
# one pair at the reference CE geometry (same bs32/200² crop)
train_pair 4 ce_loss
date | tee -a "$LOG"
python scripts/r4_int8_ab_parse.py "$OUT" | tee -a "$LOG"
