#!/bin/bash
# Round-3 TPU work queue (sequential — one chip).
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
CLS=experiments/uci/classification/main.py
CCFG=experiments/uci/classification/config_precond.yaml
for d in breast_wdbc digits_even wine_uci; do
  echo "=== extras: $d $(date)" >> experiments/uci/classification/run_r3_extras.log
  python $CLS --config_path $CCFG --dataset $d --outputs_dirname outputs_precond >> experiments/uci/classification/run_r3_extras.log 2>&1
done
REG=experiments/uci/regression/main.py
RCFG=experiments/uci/regression/config_precond.yaml
echo "=== regression precond sweep $(date)" >> experiments/uci/regression/run_r3_precond.log
python $REG --config_path $RCFG --outputs_dirname outputs_precond >> experiments/uci/regression/run_r3_precond.log 2>&1
echo "=== regression diabetes_sklearn $(date)" >> experiments/uci/regression/run_r3_precond.log
python $REG --config_path $RCFG --dataset diabetes_sklearn --outputs_dirname outputs_precond >> experiments/uci/regression/run_r3_precond.log 2>&1
echo "=== queue done $(date)" >> /tmp/r3_queue.log
