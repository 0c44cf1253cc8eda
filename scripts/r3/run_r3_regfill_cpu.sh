#!/bin/bash
# CPU gap-fill for the regression MAP sweep while the TPU tunnel is down:
# fills the three holes that gate the headline switch to outputs_precond_map
# (kin8nm seed 9 — the TPU-hang casualty, wine_quality seed 9, and the
# diabetes_sklearn extras that were starting when the tunnel died). Writes
# into the SAME outputs dir as the TPU sweep — 12 of 850 dataset-seed cells
# become host-CPU fp32 runs of the identical config; noted in RESULTS.md.
# nice'd one notch above the smooth CPU sweep so this short job finishes
# first on the single host core.
cd /root/repo
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
REG=experiments/uci/regression/main.py
RCFG=experiments/uci/regression/config_precond_map.yaml
LOG=experiments/uci/regression/run_r3_map.log
echo "=== regression map gap-fill (host CPU, TPU outage) $(date)" >> "$LOG"
for ds in kin8nm wine_quality; do
  nice -n 15 timeout 7200 python $REG --config_path $RCFG --dataset "$ds" --data_seed 9 \
    --outputs_dirname outputs_precond_map >> "$LOG" 2>&1
done
for seed in 0 1 2 3 4 5 6 7 8 9; do
  echo "=== map extras gap-fill (cpu): diabetes_sklearn seed $seed $(date)" >> "$LOG"
  nice -n 15 timeout 3600 python $REG --config_path $RCFG --dataset diabetes_sklearn \
    --data_seed "$seed" --outputs_dirname outputs_precond_map >> "$LOG" 2>&1
done
echo "regfill-cpu done $(date)" >> /tmp/r3_queue.log
