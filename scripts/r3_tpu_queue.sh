#!/bin/bash
# Round-3 remaining TPU measurements, run AFTER scripts/int8_train_bench.sh.
# ONE TPU job at a time; keep the host idle during timing runs (CLAUDE.md).
# Results append to /tmp/r3_tpu_queue.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_tpu_queue.log
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | tail -6 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 124 ]; then
    echo "TIMEOUT ($*) — aborting queue (poisoned compile queue)" | tee -a "$LOG"
    exit 124
  fi
}
date | tee -a "$LOG"
# 1. grouped/depthwise int8 A/B (the new lever): flagship + depthwise zoo
run python scripts/int8_serving_bench.py --variants bf16,int8_exec_xla
run python scripts/int8_serving_bench.py --variants bf16,int8_exec_xla --grouped
run python scripts/int8_serving_bench.py --backbone mobilenetv2 --size 200 --batch 32 --variants bf16,int8_exec_xla
run python scripts/int8_serving_bench.py --backbone mobilenetv2 --size 200 --batch 32 --variants bf16,int8_exec_xla --grouped
run python scripts/int8_serving_bench.py --backbone xception --size 200 --batch 32 --variants bf16,int8_exec_xla
run python scripts/int8_serving_bench.py --backbone xception --size 200 --batch 32 --variants bf16,int8_exec_xla --grouped
# 1b. OS=8 (full-rate dilated backbone, 4x the ASPP FLOPs): int8 leverage
#     at the expensive config; batch 4 per the bf16 OS=8 row in BASELINE.md
run python scripts/int8_serving_bench.py --output_stride 8 --batch 4 --variants bf16,int8_exec_xla
# 2. grouped/wide zoo rates at the deploy tile
run python bench.py --backbone resnext50_32x4d --size 200 --batch 32 --steps 50
run python bench.py --backbone wide_resnet50_2 --size 200 --batch 32 --steps 50
# 2b. int8_bwd training at the OTHER train geometries (the 512x512 sweep
#     lives in BASELINE.md already): the reference's 200x200/bs32 config,
#     and the OS=8 full-rate dilated backbone
run python bench.py --size 200 --batch 32 --steps 50
run python bench.py --size 200 --batch 32 --steps 50 --int8_training 256 --int8_bwd
run python bench.py --output_stride 8 --batch 4 --steps 50 --int8_training 256 --int8_bwd
# 2c. whole-scene 4096^2 with executed int8 (device-side clock), with a
#     same-session bf16 control (BASELINE.md's 0.149 s/scene row predates
#     the --device_clock flag; re-measure both under it)
run python examples/whole_scene_demo.py --scene 4096 --tile 512 --tile_batch 8 \
    --reps 3 --no_products --device_clock
run python examples/whole_scene_demo.py --scene 4096 --tile 512 --tile_batch 8 \
    --reps 3 --no_products --device_clock --serving_variant int8_exec_xla
# 3. headline parity check (BENCH_r03 >= BENCH_r02) — also exercises the
#    new int8_train_tiles_per_sec row in bench.py
run python bench.py
date | tee -a "$LOG"
