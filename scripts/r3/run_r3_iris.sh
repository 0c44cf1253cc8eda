#!/bin/bash
# 10-seed smoothed-protocol run of the new REAL iris_binary dataset
# (sklearn-bundled UCI iris, versicolor-vs-virginica). Queued behind the
# main CPU smooth sweep so the single core is never contended.
cd /root/repo
while kill -0 $(cat /tmp/smooth_cpu.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
LOG=$BASE/run_r3_smooth_cpu.log
for seed in 0 1 2 3 4 5 6 7 8 9; do
  echo "=== cpu smooth: iris_binary seed $seed $(date)" >> "$LOG"
  nice -n 19 timeout 5400 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
    --dataset iris_binary --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
done
echo "iris_binary smooth done $(date)" >> /tmp/r3_queue.log
