#!/bin/bash
# Round-5 TPU queue (sequential — ONE TPU job at a time, CLAUDE.md), in
# VERDICT-r4 priority order:
#   0. the 11,712-file / 11,008² scale rehearsal (VERDICT ask 1 — written
#      in r4, never ran)
#   1. int8 serving r3-vs-HEAD same-session A/B (ask 3: settle the -6%)
#   2. trainer end-to-end throughput attribution (ask 4)
#   3. cost-router off-calibration A/Bs: OS=8 512² + mobilenetv2 (ask 5)
#   4. int8_bwd accuracy study seeds 3 (IWce) + 4 (ce_loss, reference
#      geometry) — ask 2 first half
#   5. hybrid int8-early/bf16-finish arms, seeds 1+2 (ask 2 second half;
#      same seed/data as the r4 arms, switch at 2400/3000)
# Deadline-aware between stages.  Log: /tmp/r5_queue.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r5_queue.log
DEADLINE=${DEADLINE:-$(date -u -d '+11 hours' +%s)}
cd /root/repo
date -u | tee -a "$LOG"

ck() {  # deadline check
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    echo "deadline hit before $1 — stopping queue" | tee -a "$LOG"
    date -u | tee -a "$LOG"
    exit 0
  fi
}
stage_cp() { cp -f "$LOG" logs/r5_queue.log 2>/dev/null; }

echo "=== 0. scale rehearsal (11,712 files / 11,0082 scene) ===" | tee -a "$LOG"
bash scripts/r4_scale_rehearsal.sh 2>&1 | tail -60 | tee -a "$LOG"
cp -f /tmp/r4_scale.log logs/r5_scale.log 2>/dev/null
stage_cp

ck "serving A/B"
echo "=== 1. int8 serving r3(08bd131)-vs-HEAD same-session A/B ===" | tee -a "$LOG"
for arm in r3 head r3b; do
  case $arm in
    r3|r3b) PP=/tmp/r3wt; SB=/tmp/r3wt/scripts/int8_serving_bench.py ;;
    head)   PP=/root/repo; SB=scripts/int8_serving_bench.py ;;
  esac
  echo "--- arm $arm ($(date -u +%H:%M)) ---" | tee -a "$LOG"
  PYTHONPATH=$PP:/root/.axon_site timeout 2400 python "$SB" \
    --batch 8 --size 512 --steps 50 --variants bf16,int8_exec_xla \
    2>&1 | tail -12 | tee -a "$LOG"
done
stage_cp

ck "trainer attribution"
echo "=== 2. trainer end-to-end attribution (2002/bs32 resnet50) ===" | tee -a "$LOG"
timeout 3600 python scripts/trainer_attribution.py \
  --steps 200 --crop 200 --batch 32 --train_size 1024 \
  2>&1 | tail -18 | tee -a "$LOG"
stage_cp

ck "cost-router A/Bs"
echo "=== 3. cost-router off-calibration A/Bs ===" | tee -a "$LOG"
echo "--- 3a. OS=8 512^2/bs4: gate-256 vs cost(floor 64) vs bf16 ---" | tee -a "$LOG"
timeout 3600 python bench.py --output_stride 8 --batch 4 \
  --int8_training 256 --int8_bwd --int8_route gate 2>&1 | tail -2 | tee -a "$LOG"
timeout 3600 python bench.py --output_stride 8 --batch 4 \
  --int8_training 64 --int8_bwd --int8_route cost 2>&1 | tail -2 | tee -a "$LOG"
echo "--- 3b. mobilenetv2 200^2/bs32: gate-256 vs cost(floor 64) ---" | tee -a "$LOG"
timeout 3600 python bench.py --backbone mobilenetv2 --size 200 --batch 32 \
  --int8_training 256 --int8_bwd --int8_route gate 2>&1 | tail -2 | tee -a "$LOG"
timeout 3600 python bench.py --backbone mobilenetv2 --size 200 --batch 32 \
  --int8_training 64 --int8_bwd --int8_route cost 2>&1 | tail -2 | tee -a "$LOG"
stage_cp

OUT=/tmp/ab_r4
mkdir -p "$OUT"
run_one() {  # $1 seed, $2 loss, $3 mode, [$4 extra flags], [$5 tag suffix]
  seed=$1; loss=$2; mode=$3; extra=${4:-}; suf=${5:-}
  tag="${loss}_s${seed}_${mode}${suf}"
  if [ "$mode" = int8 ]; then extra="--int8_training 256 --int8_bwd 1 $extra"; fi
  echo "=== $tag ($(date -u +%H:%M)) ===" | tee -a "$LOG"
  timeout 3600 python -m iswm_tpu.cli.train \
    --synthetic --data_root "$OUT/data_s${seed}" \
    --model deeplabv3plus_resnet50 --output_stride 16 \
    --crop_size 200 --batch_size 32 --loss_type "$loss" \
    --total_itrs 3000 --val_interval 500 --print_interval 100 \
    --random_seed "$seed" $extra \
    --checkpoints_dir "$OUT/$tag/ckpt" \
    --val_results_dir "$OUT/$tag/val" \
    --log_dir "$OUT/$tag/logs" \
    --val_dump_limit 1 \
    2>&1 | tail -3 | tee -a "$LOG"
}

echo "=== 4. int8_bwd accuracy study: seeds 3 (IWce) + 4 (ce_loss) ===" | tee -a "$LOG"
for pair in "3 IWce_loss" "4 ce_loss"; do
  set -- $pair
  ck "study seed $1"
  run_one "$1" "$2" bf16
  run_one "$1" "$2" int8
  stage_cp
done
python scripts/r4_int8_ab_parse.py "$OUT" 2>&1 | tee -a "$LOG" | tee /tmp/r5_int8_ab_summary.txt
stage_cp

echo "=== 5. hybrid int8-early/bf16-finish arms (switch @2400/3000) ===" | tee -a "$LOG"
for seed in 1 2; do
  ck "hybrid seed $seed"
  run_one "$seed" IWce_loss int8 "--int8_switch_iter 2400" "_hyb2400"
  stage_cp
done
python scripts/r4_int8_ab_parse.py "$OUT" 2>&1 | tail -20 | tee -a "$LOG"
stage_cp
date -u | tee -a "$LOG"
echo "r5 queue complete" | tee -a "$LOG"
