#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 asks 1, 2 and the headline).
# ONE TPU job at a time; keep the host idle during timing runs (CLAUDE.md).
# Results append to /tmp/r4_tpu_queue.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_tpu_queue.log
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | tail -8 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 124 ]; then
    echo "TIMEOUT ($*) — aborting queue (poisoned compile queue)" | tee -a "$LOG"
    exit 124
  fi
}
date | tee -a "$LOG"

# --- 1. blockdiag productization (VERDICT ask 1) -------------------------
# 1a. resnext50 @200²/bs32, the now-DEFAULT auto blockdiag: train+infer
#     (r3 rows to beat: 846.8 train / 2679.2 infer native; 1113.9/3660.6
#     with the then-opt-in gate 256)
run python bench.py --backbone resnext50_32x4d --size 200 --batch 32 --steps 50
# 1b. composed blockdiag + int8_exec_xla serving (the r3 interceptor
#     skipped blockdiag sites; now BlockDiagConv routes like dense).
#     Control r3 rows: int8-no-blockdiag 3509.2; blockdiag-bf16 3660.6.
run python scripts/int8_serving_bench.py --backbone resnext50_32x4d --size 200 --batch 32 --variants bf16,int8_exec_xla
# 1c. resnext101_32x8d blockdiag gate sweep (r3 native row: 367.0 train /
#     1142.7 infer — the slowest zoo member; widths are 2x resnext50's, so
#     the layer1+2 window is gate 512 here, not 256)
run python bench.py --backbone resnext101_32x8d --size 200 --batch 32 --steps 50 --grouped_blockdiag 0
run python bench.py --backbone resnext101_32x8d --size 200 --batch 32 --steps 50 --grouped_blockdiag 256
run python bench.py --backbone resnext101_32x8d --size 200 --batch 32 --steps 50 --grouped_blockdiag 512
# 1d. resnext101 composed serving at the measured-best gate (re-run with
#     --grouped_blockdiag N if 512 wins the sweep above)
run python scripts/int8_serving_bench.py --backbone resnext101_32x8d --size 200 --batch 32 --variants bf16,int8_exec_xla --grouped_blockdiag 512

# --- 2. per-site cost-routed int8 training (VERDICT ask 2) ---------------
# Controls first (same-session): the r3 best gate rows.
run python bench.py --steps 50 --int8_training 256 --int8_bwd
run python bench.py --steps 50 --int8_training 64 --int8_bwd --int8_route cost
run python bench.py --size 200 --batch 32 --steps 50 --int8_training 256 --int8_bwd
run python bench.py --size 200 --batch 32 --steps 50 --int8_training 64 --int8_bwd --int8_route cost

# --- 3. headline (also the int8 serving + int8-train extra rows) ---------
run python bench.py
date | tee -a "$LOG"
