#!/bin/bash
# Round-3 mean-constant-select classification sweep (TPU fp32, sequential).
# outputs_precond_m0 seed dirs are pre-seeded with the cached GP/SVGP/
# inducing-point artifacts from outputs_precond; only PLS retrains (both
# m0 candidates, winner kept by train NLL).
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
CLS=experiments/uci/classification/main.py
CCFG=experiments/uci/classification/config_precond.yaml
LOG=experiments/uci/classification/run_r3_m0select.log
echo "=== m0-select sweep (8 reference datasets, all seeds) $(date)" >> $LOG
python $CLS --config_path $CCFG --outputs_dirname outputs_precond_m0 >> $LOG 2>&1
for d in breast_wdbc digits_even wine_uci; do
  echo "=== m0-select extras: $d $(date)" >> $LOG
  python $CLS --config_path $CCFG --dataset $d --outputs_dirname outputs_precond_m0 >> $LOG 2>&1
done
echo "m0select done $(date)" >> /tmp/r3_queue.log
