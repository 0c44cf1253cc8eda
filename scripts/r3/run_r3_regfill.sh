#!/bin/bash
# Gap-fill for the regression MAP sweep: the seed-9 kin8nm pls-student-onb
# run hung on the flaky TPU compile service and was killed; rerunning the
# sweep loads every cached model and trains only the missing ones.
# Waits for the regmap wrapper AND the smooth classification sweep.
cd /root/repo
while kill -0 $(cat /tmp/regmap_wait.pid) 2>/dev/null; do sleep 60; done
while kill -0 $(cat /tmp/smooth_sweep.pid) 2>/dev/null; do sleep 60; done
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
REG=experiments/uci/regression/main.py
RCFG=experiments/uci/regression/config_precond_map.yaml
LOG=experiments/uci/regression/run_r3_map.log
echo "=== regression map gap-fill $(date)" >> $LOG
timeout 5400 python $REG --config_path $RCFG --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "=== regression map extras gap-fill: diabetes_sklearn $(date)" >> $LOG
timeout 2700 python $REG --config_path $RCFG --dataset diabetes_sklearn --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "regfill done $(date)" >> /tmp/r3_queue.log
