#!/bin/bash
# wine_uci smooth-protocol seeds 5 and 9 on the TPU chip: their step-size
# search provably reaches the 1e7-epoch candidate (the consecutive-energy
# break never fires before it), which is ~12-16h on the 1-core host CPU but
# minutes on the chip. Writes into the same outputs_precond_smooth_cpu dir
# as the CPU sweep (identical config/protocol, fp32 both; backend provenance
# recorded here and in the run log).
cd /root/repo
# PLST_X64=0 is what actually selects the TPU: with x64 enabled main.py
# force-pins the run to the host CPU (fp64 belongs on the host), which would
# silently defeat this script's whole purpose.
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
LOG=$BASE/run_r3_smooth_cpu.log
for seed in 5 9; do
  echo "=== TPU smooth (1e7-epoch candidate infeasible on CPU): wine_uci seed $seed $(date)" >> "$LOG"
  timeout 7200 python $BASE/main.py --config_path $BASE/config_precond_smooth.yaml \
    --dataset wine_uci --data_seed "$seed" --outputs_dirname outputs_precond_smooth_cpu >> "$LOG" 2>&1
  echo "wine_uci tpu seed $seed done rc=$? $(date)" >> /tmp/r3_queue.log
done
echo "winetpu done $(date)" >> /tmp/r3_queue.log
