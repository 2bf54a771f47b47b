#!/bin/bash
# Round-4 real-data SCALE rehearsal (VERDICT r3 ask 6, DVC-unreachable arm).
#
# The real Himawari dataset is 11,712 files / 244 MB (reference
# data.dvc:2-4) of timestamp-named 200² tiles, and a production scene is
# the full Himawari-8/9 disk (11,000²).  The DVC S3 remote is unreachable
# from this box (probe recorded in ROADMAP), so this rehearses the
# framework at the REAL dataset's shape instead:
#   1. synthetic tree with exactly 11,712 files ((4880 train + 976 val)
#      scenes x {img, mask}), Himawari-style sortable timestamp names
#   2. data doctor + MD5 manifest governance at that file count
#   3. the full train CLI against it: loader + IW-CE class-weight pass
#      over 4880 files + windowed validation sorting 976 frames
#   4. an 11,008² whole-disk TileEngine scene (true Himawari dimensions)
#
# ONE TPU job at a time (CLAUDE.md).  Log: /tmp/r4_scale.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_scale.log
ROOT=/tmp/scale_rehearsal/data
date | tee -a "$LOG"

if [ ! -d "$ROOT/train" ]; then
  echo "=== generating 11,712-file tree ===" | tee -a "$LOG"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF' 2>&1 | tee -a "$LOG"
import time

from iswm_tpu.data.synthetic import write_dataset

t0 = time.time()
# (4880 + 976) scenes x (img + mask) = 11,712 files — the real dataset's
# exact file count (reference data.dvc:2-4)
write_dataset("/tmp/scale_rehearsal/data", n_train=4880, n_val=976,
              size=(200, 200), seed=11712)
print(f"wrote 11712 files in {time.time() - t0:.0f}s")
EOF
fi

echo "=== data doctor @ 11,712 files ===" | tee -a "$LOG"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m iswm_tpu.data.doctor "$ROOT" 2>&1 | tail -4 | tee -a "$LOG"

echo "=== manifest build+verify @ 11,712 files ===" | tee -a "$LOG"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m iswm_tpu.data.manifest build "$ROOT" /tmp/scale_rehearsal/manifest.json 2>&1 | tail -2 | tee -a "$LOG"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m iswm_tpu.data.manifest verify "$ROOT" /tmp/scale_rehearsal/manifest.json 2>&1 | tail -2 | tee -a "$LOG"

echo "=== train CLI @ 4880-file loader + IW-CE class weights + 976-frame windowed val ===" | tee -a "$LOG"
timeout 7200 python -m iswm_tpu.cli.train \
  --data_root "$ROOT" \
  --model deeplabv3plus_resnet50 --output_stride 16 \
  --crop_size 200 --batch_size 32 --loss_type IWce_loss \
  --total_itrs 400 --val_interval 400 --print_interval 100 \
  --random_seed 1 \
  --checkpoints_dir /tmp/scale_rehearsal/ckpt \
  --val_results_dir /tmp/scale_rehearsal/val \
  --log_dir /tmp/scale_rehearsal/logs \
  --val_dump_limit 1 \
  2>&1 | tail -6 | tee -a "$LOG"

echo "=== 11,008² whole-disk TileEngine scene (bf16 + int8) ===" | tee -a "$LOG"
timeout 7200 python examples/whole_scene_demo.py --scene 11008 --tile 512 \
  --tile_batch 8 --reps 3 --no_products --device_clock \
  2>&1 | tail -5 | tee -a "$LOG"
timeout 7200 python examples/whole_scene_demo.py --scene 11008 --tile 512 \
  --tile_batch 8 --reps 3 --no_products --device_clock \
  --serving_variant int8_exec_xla 2>&1 | tail -5 | tee -a "$LOG"
date | tee -a "$LOG"
