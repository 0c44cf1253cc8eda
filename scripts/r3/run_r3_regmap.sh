#!/bin/bash
# Regression mean-constant-MAP sweep (TPU fp32); waits for the classification
# map sweep, then retrains only PLS on pre-seeded cached artifacts.
cd /root/repo
while kill -0 $(cat /tmp/map_sweep.pid) 2>/dev/null; do sleep 60; done
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
REG=experiments/uci/regression/main.py
RCFG=experiments/uci/regression/config_precond_map.yaml
LOG=experiments/uci/regression/run_r3_map.log
echo "=== regression map sweep (6 reference datasets, all seeds) $(date)" >> $LOG
python $REG --config_path $RCFG --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "=== regression map extras: diabetes_sklearn $(date)" >> $LOG
python $REG --config_path $RCFG --dataset diabetes_sklearn --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "regmap done $(date)" >> /tmp/r3_queue.log
