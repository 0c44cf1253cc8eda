#!/bin/bash
# TPU-tunnel watchdog: the axon backend went unreachable at ~20:45 UTC and the
# queue scripts (run_r3_smooth.sh pid 20012, run_r3_regfill.sh pid 21156) were
# SIGSTOPped so they don't launch sweeps into a dead backend. Probe the TPU
# every 3 min; when a small matmul succeeds, resume the queue and exit.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 200); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" >/dev/null 2>&1; then
    kill -CONT 20012 21156 2>/dev/null
    echo "tpu back, queue resumed $(date)" >> /tmp/r3_queue.log
    exit 0
  fi
  echo "tpu still down, attempt $i $(date)" >> /tmp/tpu_watchdog.log
  sleep 180
done
echo "tpu watchdog gave up $(date)" >> /tmp/r3_queue.log
