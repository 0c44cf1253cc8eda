#!/bin/bash
# Round-4 headline classification sweep ON-CHIP (TPU fp32) on the round-4
# deterministic (sha256-pinned) stand-in data: 8 reference datasets + 4 real
# sklearn-bundled extras, n=10 seeds everywhere (VERDICT #2).
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
CLS=experiments/uci/classification/main.py
CCFG=experiments/uci/classification/config_precond_smooth.yaml
LOG=experiments/uci/classification/run_r4_smooth.log
echo "=== r4 classification smooth sweep (fresh data, on-chip) $(date)" >> $LOG
python $CLS --config_path $CCFG --outputs_dirname outputs_precond_smooth >> $LOG 2>&1
for d in breast_wdbc digits_even iris_binary wine_uci; do
  echo "=== r4 classification extras: $d $(date)" >> $LOG
  python $CLS --config_path $CCFG --dataset $d --outputs_dirname outputs_precond_smooth >> $LOG 2>&1
done
echo "r4 classification sweep done $(date)" >> /tmp/r4/queue.log
