#!/usr/bin/env bash
# IW-weighted CE training (the reference's run_iwce_loss.sh differs from
# run_ce_loss.sh only in LOSS_TYPE and BATCH_SIZE; SURVEY §5.6).
set -euo pipefail
export LOSS_TYPE="${LOSS_TYPE:-IWce_loss}"
export BATCH_SIZE="${BATCH_SIZE:-128}"
exec "$(dirname "$0")/run_ce_loss.sh"
