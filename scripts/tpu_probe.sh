#!/bin/bash
# Patiently probe the tunneled TPU backend until it answers; log each
# attempt to /tmp/tpu_probe.log.  Used while the axon backend is down to
# know the moment the round-3 measurement queue (int8_train_bench.sh,
# r3_tpu_queue.sh) can run.  Safe to timeout-kill: the probe is
# devices()+tiny matmul only, NOT a server-side compile (CLAUDE.md's
# never-kill-a-compile rule is about big Mosaic/XLA programs whose
# compiles keep burning in the one-at-a-time server queue).
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 40); do
  echo "[probe $i] $(date)" >> /tmp/tpu_probe.log
  timeout 300 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
x = jnp.ones((128,128), jnp.bfloat16)
print('matmul ok:', float((x@x)[0,0]), flush=True)
" >> /tmp/tpu_probe.log 2>&1
  if [ $? -eq 0 ]; then echo "TPU UP at $(date)" >> /tmp/tpu_probe.log; exit 0; fi
  sleep 120
done
echo "TPU still down after all probes $(date)" >> /tmp/tpu_probe.log
exit 1
