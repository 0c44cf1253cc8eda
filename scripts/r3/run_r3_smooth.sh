#!/bin/bash
# Residual-smoothed classification sweep (TPU fp32): the headline round-3
# protocol (nystrom scaling + preconditioned discretisation + MAP prior mean
# + FITC-style residual-smoothed Bernoulli cost). Waits for the regression
# MAP sweep, pre-seeds cached kernels/SVGP from outputs_precond_map, then
# retrains only the PLS models.
cd /root/repo
while kill -0 $(cat /tmp/regmap_wait.pid) 2>/dev/null; do sleep 60; done
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
SRC=$BASE/outputs_precond_map
DST=$BASE/outputs_precond_smooth
for seed in 0 1 2 3 4 5 6 7 8 9; do
  mkdir -p $DST/$seed/models
  [ -d $DST/$seed/data ] || cp -r $SRC/$seed/data $DST/$seed/data
  for ds_dir in $SRC/$seed/models/*/; do
    ds=$(basename $ds_dir)
    mkdir -p $DST/$seed/models/$ds
    [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $ds_dir/subsample_gp $DST/$seed/models/$ds/subsample_gp
    [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $ds_dir/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
  done
done
CLS=$BASE/main.py
CFG=$BASE/config_precond_smooth.yaml
LOG=$BASE/run_r3_smooth.log
echo "=== classification smooth sweep (8 reference datasets, all seeds) $(date)" >> $LOG
python $CLS --config_path $CFG --outputs_dirname outputs_precond_smooth >> $LOG 2>&1
for ds in breast_wdbc digits_even wine_uci; do
  echo "=== smooth extras: $ds $(date)" >> $LOG
  python $CLS --config_path $CFG --dataset $ds --outputs_dirname outputs_precond_smooth >> $LOG 2>&1
done
echo "smooth sweep done $(date)" >> /tmp/r3_queue.log
