#!/bin/bash
# Round-3 mean-constant-MAP classification sweep (TPU fp32, sequential).
# outputs_precond_map seed dirs are pre-seeded with the cached GP/SVGP/
# inducing-point artifacts; only PLS retrains (single MAP m0 per model).
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
CLS=experiments/uci/classification/main.py
CCFG=experiments/uci/classification/config_precond_map.yaml
LOG=experiments/uci/classification/run_r3_map.log
echo "=== map sweep (8 reference datasets, all seeds) $(date)" >> $LOG
python $CLS --config_path $CCFG --outputs_dirname outputs_precond_map >> $LOG 2>&1
for d in breast_wdbc digits_even wine_uci; do
  echo "=== map extras: $d $(date)" >> $LOG
  python $CLS --config_path $CCFG --dataset $d --outputs_dirname outputs_precond_map >> $LOG 2>&1
done
echo "map sweep done $(date)" >> /tmp/r3_queue.log
