#!/bin/bash
# Rerun wine_uci seeds 5 and 9 of the CPU smooth sweep: both hit the sweep's
# 90-min timeout mid-candidate because ad-hoc probe/test processes contended
# for the single core (all other seeds fit comfortably). Generous timeout,
# then resume the queued iris_binary 10-seed run.
cd /root/repo
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
LOG=$BASE/run_r3_smooth_cpu.log
for seed in 5 9; do
  echo "=== cpu smooth (rerun, uncontended): wine_uci seed $seed $(date)" >> "$LOG"
  nice -n 19 timeout 10800 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
    --dataset wine_uci --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
done
echo "winefix done $(date)" >> /tmp/r3_queue.log
for seed in 0 1 2 3 4 5 6 7 8 9; do
  echo "=== cpu smooth: iris_binary seed $seed $(date)" >> "$LOG"
  nice -n 19 timeout 5400 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
    --dataset iris_binary --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
done
echo "iris_binary smooth done $(date)" >> /tmp/r3_queue.log
