#!/bin/bash
# Round-4 loss-attribution ablations (VERDICT #4): for each dataset with a
# significant headline NLL loss, run the protocol with one ingredient
# toggled — smoothing off (config_precond_map), m0 off (config_precond),
# J=1000 (config_precond_smooth_j1000) — on the SAME pinned data, reusing
# the headline sweep's cached experiment data / subsample GPs / SVGP.
# Usage: DATASETS="breast_wdbc wine_uci" SEEDS="0 1 2 3 4 5 6 7 8 9" ./run_r4_ablation.sh
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
SRC=$BASE/outputs_precond_smooth
LOG=$BASE/run_r4_ablation.log
DATASETS=${DATASETS:?set DATASETS}
SEEDS=${SEEDS:-"0 1 2 3 4 5 6 7 8 9"}

seed_cache () {  # seed_cache <dst_outputs_dirname> <dataset> <seed>
  local DST=$BASE/$1 ds=$2 seed=$3
  mkdir -p $DST/$seed/data $DST/$seed/models/$ds
  [ -d $DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $DST/$seed/data/$ds 2>/dev/null
  [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $DST/$seed/models/$ds/subsample_gp 2>/dev/null
  [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $SRC/$seed/models/$ds/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
}

run_cell () {  # run_cell <config> <outputs_dirname> <dataset> <seed>
  echo "=== r4abl: cfg=$1 ds=$3 seed=$4 $(date)" >> "$LOG"
  seed_cache "$2" "$3" "$4"
  # the pre-seeded svgp.pkl makes the SVGP branch a checkpoint load; only
  # the PLS model trains (classification main has no --models flag)
  timeout 5400 python $BASE/main.py --config_path $BASE/$1 \
    --dataset "$3" --data_seed "$4" --outputs_dirname "$2" >> "$LOG" 2>&1
}

for seed in $SEEDS; do
  for ds in $DATASETS; do
    run_cell config_precond_map.yaml outputs_precond_map $ds $seed
    run_cell config_precond.yaml outputs_precond $ds $seed
    run_cell config_precond_smooth_j1000.yaml outputs_precond_smooth_j1000 $ds $seed
  done
done
echo "r4 ablation done $(date)" >> /tmp/r4/queue.log
