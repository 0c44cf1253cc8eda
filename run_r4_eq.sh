#!/bin/bash
# Round-4 loss-attribution follow-up: the spread-equilibration framework
# fix — pls.equilibrate_spread 1e-2, everything else the headline protocol —
# on the two datasets with significant headline NLL losses, reusing the
# headline sweep's cached splits / subsample GPs / SVGP checkpoints.
# Chains after the main ablation queue when WAIT_PID is set (won't fight it
# for the one physical core / the TPU tunnel).
# Usage: [WAIT_PID=<pid>] [DATASETS="breast_wdbc wine_uci"] ./run_r4_eq.sh
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
SRC=$BASE/outputs_precond_smooth
LOG=$BASE/run_r4_eq.log
DATASETS=${DATASETS:-"breast_wdbc wine_uci"}
SEEDS=${SEEDS:-"0 1 2 3 4 5 6 7 8 9"}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

seed_cache () {  # seed_cache <dst_outputs_dirname> <dataset> <seed>
  local DST=$BASE/$1 ds=$2 seed=$3
  mkdir -p $DST/$seed/data $DST/$seed/models/$ds
  [ -d $DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $DST/$seed/data/$ds 2>/dev/null
  [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $DST/$seed/models/$ds/subsample_gp 2>/dev/null
  [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $SRC/$seed/models/$ds/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
}

for seed in $SEEDS; do
  for ds in $DATASETS; do
    echo "=== r4eq: ds=$ds seed=$seed $(date)" >> "$LOG"
    seed_cache outputs_precond_smooth_eq $ds $seed
    timeout 5400 python $BASE/main.py \
      --config_path $BASE/config_precond_smooth_eq.yaml \
      --dataset "$ds" --data_seed "$seed" \
      --outputs_dirname outputs_precond_smooth_eq >> "$LOG" 2>&1
  done
done
echo "r4 eq done $(date)" >> /tmp/r4/queue.log
