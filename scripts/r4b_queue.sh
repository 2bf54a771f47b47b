#!/bin/bash
# Round-4b TPU queue (sequential — ONE TPU job at a time, CLAUDE.md):
#   0. diagnosis: int8_exec_xla serving @512² re-measure (the r4a end-of-queue
#      bench read int8_infer 1067 tiles/s vs 1306-1355 in r3 — regression or
#      noise? routed_sites + a clean A/B decide)
#   1. blockdiag accuracy A/B on resnext50 (VERDICT r3 ask 1a)
#   2. multi-seed int8_bwd accuracy study (VERDICT r3 ask 4), deadline-aware:
#      runs complete (seed, mode) pairs until the cutoff so partial results
#      are still well-formed for scripts/r4_int8_ab_parse.py
# Log: /tmp/r4b_queue.log (+ staged copies under logs/).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4b_queue.log
DEADLINE=${DEADLINE:-$(date -u -d '15:05' +%s)}   # last moment to START a train run
cd /root/repo
date -u | tee -a "$LOG"

echo "=== 0a. int8 serving diagnosis: resnet50 512x512 bf16 vs int8_exec_xla ===" | tee -a "$LOG"
timeout 1800 python scripts/int8_serving_bench.py --batch 8 --size 512 --steps 50 \
  --variants bf16,int8_exec_xla 2>&1 | tail -16 | tee -a "$LOG"
cp -f "$LOG" logs/r4b_queue.log

echo "=== 1. blockdiag accuracy A/B (resnext50, 1500 iters, same seed) ===" | tee -a "$LOG"
bash scripts/r4_blockdiag_ab.sh 2>&1 | tail -40 | tee -a "$LOG"
cp -f /tmp/r4_blockdiag_ab.log logs/ 2>/dev/null
cp -f "$LOG" logs/r4b_queue.log

echo "=== 2. multi-seed int8_bwd accuracy study (deadline-aware) ===" | tee -a "$LOG"
OUT=/tmp/ab_r4
mkdir -p "$OUT"
run_one() {  # $1 seed, $2 loss, $3 mode
  seed=$1; loss=$2; mode=$3
  tag="${loss}_s${seed}_${mode}"
  extra=""
  if [ "$mode" = int8 ]; then extra="--int8_training 256 --int8_bwd 1"; fi
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
for pair in "1 IWce_loss" "2 IWce_loss" "3 IWce_loss" "4 ce_loss"; do
  set -- $pair
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    echo "deadline hit before seed $1 — stopping study" | tee -a "$LOG"; break
  fi
  run_one "$1" "$2" bf16
  run_one "$1" "$2" int8
  cp -f "$LOG" logs/r4b_queue.log
done
python scripts/r4_int8_ab_parse.py "$OUT" 2>&1 | tee -a "$LOG" | tee /tmp/r4_int8_ab_summary.txt
cp -f "$LOG" logs/r4b_queue.log
date -u | tee -a "$LOG"
