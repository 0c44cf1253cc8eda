#!/bin/bash
# Second-shift TPU-tunnel watchdog: run_r3_tpu_watchdog.sh gives up after 200
# probes (~14:40 UTC Aug 18). This one takes over if the queue is still
# paused at that point and keeps probing to round end (another ~10 h), so a
# late tunnel recovery still resumes the paused sweeps (run_r3_smooth.sh pid
# 20012, run_r3_regfill.sh pid 21156) automatically.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# Hand-off: don't double-probe while the first watchdog is still alive.
while kill -0 $(cat /tmp/tpu_watchdog.pid 2>/dev/null) 2>/dev/null; do sleep 120; done
for i in $(seq 1 220); do
  # Stop if the first watchdog already resumed the queue (pids no longer stopped).
  if ! ps -o stat= -p 20012 2>/dev/null | grep -q T; then
    echo "watchdog2: queue already running, exiting $(date)" >> /tmp/r3_queue.log
    exit 0
  fi
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" >/dev/null 2>&1; then
    kill -CONT 20012 21156 2>/dev/null
    echo "tpu back (watchdog2), queue resumed $(date)" >> /tmp/r3_queue.log
    exit 0
  fi
  echo "watchdog2: tpu still down, attempt $i $(date)" >> /tmp/tpu_watchdog.log
  sleep 180
done
echo "tpu watchdog2 gave up $(date)" >> /tmp/r3_queue.log
