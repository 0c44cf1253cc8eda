#!/bin/bash
# Third-shift TPU-tunnel watchdog. The CPU fallback sweeps made the paused
# TPU sweeps redundant (killed); what still NEEDS the chip, in order:
#   1. run_r3_winetpu.sh — wine_uci smooth seeds 5/9 (1e7-epoch candidate,
#      infeasible on the 1-core host) -> completes the headline dir to 10/10.
#   2. make bench — refreshes BENCH_TABLE.json incl. the bernoulli_smoothed
#      general_fused row that has never run on hardware.
#   3. make test-tpu — hardware stochastic-law lane rerun.
# Probes every 3 min to ~21:00 UTC; on success runs the chain and logs each
# stage to /tmp/r3_queue.log for the session to pick up (results regen +
# commits stay manual).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 200); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" >/dev/null 2>&1; then
    echo "tpu back (watchdog3), starting chain $(date)" >> /tmp/r3_queue.log
    bash run_r3_winetpu.sh
    echo "watchdog3: winetpu stage done $(date)" >> /tmp/r3_queue.log
    timeout 3600 make bench > /tmp/bench_r3_tpu.log 2>&1 \
      || timeout 3600 make bench > /tmp/bench_r3_tpu.log 2>&1
    echo "watchdog3: bench stage done rc=$? (log /tmp/bench_r3_tpu.log) $(date)" >> /tmp/r3_queue.log
    timeout 2400 make test-tpu > /tmp/testtpu_r3.log 2>&1
    echo "watchdog3: test-tpu stage done rc=$? (log /tmp/testtpu_r3.log) $(date)" >> /tmp/r3_queue.log
    exit 0
  fi
  echo "watchdog3: tpu still down, attempt $i $(date)" >> /tmp/tpu_watchdog.log
  sleep 180
done
echo "tpu watchdog3 gave up $(date)" >> /tmp/r3_queue.log
