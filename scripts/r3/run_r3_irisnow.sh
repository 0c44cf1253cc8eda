#!/bin/bash
# Immediate 10-seed smoothed-protocol run of iris_binary (the winefix wine
# seeds 5/9 were killed: their step-size search provably reaches a 1e7-epoch
# candidate, ~12-16h on this 1-core CPU vs minutes on the TPU — deferred to
# the chip). Seed 0's earlier partial run is simply redone; the exact-GP
# subsample models it cached are reused by the train-or-load loaders.
cd /root/repo
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
LOG=$BASE/run_r3_smooth_cpu.log
for seed in 0 1 2 3 4 5 6 7 8 9; do
  echo "=== cpu smooth: iris_binary seed $seed $(date)" >> "$LOG"
  nice -n 19 timeout 5400 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
    --dataset iris_binary --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
  echo "iris seed $seed done $(date)" >> /tmp/r3_queue.log
done
echo "iris_binary smooth done $(date)" >> /tmp/r3_queue.log
