#!/bin/bash
# int8-training end-to-end measurement session (run when the TPU is up).
#
# Measures the int8 BACKWARD lever (ops/int8_train.int8_conv_fullq*) on
# the 512² flagship train step against a same-session bf16 control, at
# the two channel gates, in both scale modes.  ONE TPU job at a time;
# each bench.py invocation is a fresh process (the chip claim drops
# between runs).  Results append to /tmp/int8_train_bench.log.
#
# Usage: bash scripts/int8_train_bench.sh
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/int8_train_bench.log
run() {
  echo "=== $* ===" | tee -a "$LOG"
  # Generous bound (compiles are server-side and slow through the tunnel).
  # On timeout ABORT the whole sweep: per CLAUDE.md, killing a timed-out
  # client leaves its compile burning in the one-at-a-time server queue,
  # so any subsequent run would hang or measure inflated times — a partial
  # honest log beats a complete corrupted one.
  timeout 7200 python bench.py "$@" 2>&1 | tail -4 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 124 ]; then
    echo "TIMEOUT ($*) — aborting sweep; wait out the server-side compile" \
      | tee -a "$LOG"
    exit 124
  fi
}
date | tee -a "$LOG"
run                                                        # bf16 control
run --int8_training 64 --int8_scale_mode delayed --int8_bwd
run --int8_training 64 --int8_bwd                          # dynamic scales
run --int8_training 256 --int8_scale_mode delayed --int8_bwd
date | tee -a "$LOG"
