#!/bin/bash
# digits_even + wine_uci extras, rerun with the chunked GP trainers.
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
CLS=experiments/uci/classification/main.py
CCFG=experiments/uci/classification/config_precond.yaml
for d in wine_uci digits_even; do
  echo "=== extras2: $d $(date)" >> experiments/uci/classification/run_r3_extras.log
  python $CLS --config_path $CCFG --dataset $d --outputs_dirname outputs_precond >> experiments/uci/classification/run_r3_extras.log 2>&1
done
echo "extras2 done $(date)" >> /tmp/r3_queue.log
