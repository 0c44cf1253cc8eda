#!/bin/bash
# CPU fallback for the residual-smoothed classification sweep while the TPU
# tunnel is down (outage since ~20:45 UTC Aug 17). Serial — this host has ONE
# core — and nice'd to 19 so the TPU queue's host-side work wins the CPU the
# moment the watchdog resumes it. Seed-major so every completed seed yields a
# full 11-dataset table; safe to kill at any point (train-or-load keying means
# completed models are never redone). Results land in a separate dir
# (outputs_precond_smooth_cpu) so the TPU sweep's outputs stay pristine.
cd /root/repo
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
LOG=$BASE/run_r3_smooth_cpu.log
# smallest datasets first within each seed so partial seeds still cover most rows
DATASETS="heart ionosphere breast_wdbc breast diabetes wine_colour wine_uci yeast digits_even rice mushrooms"
for seed in 0 1 2 3 4 5 6 7 8 9; do
  for ds in $DATASETS; do
    echo "=== cpu smooth: $ds seed $seed $(date)" >> "$LOG"
    nice -n 19 timeout 5400 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
      --dataset "$ds" --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
  done
  echo "cpu smooth seed $seed done $(date)" >> /tmp/r3_queue.log
done
echo "cpu smooth sweep done $(date)" >> /tmp/r3_queue.log
