#!/bin/bash
# Round-4 loss-attribution follow-ups, interleaved: for each (seed, dataset)
# run the T=2 (4x chain) toggle and then the spread-equilibration variant,
# so an early cut-off leaves an even seed-prefix in BOTH attribution columns
# (the paired-by-seed deltas in make_results_summary.loss_attribution_section
# use the seed intersection, so prefixes are directly usable).
#
# The round-4 VM reset wiped the gitignored headline outputs tree, so the
# seed caches (splits / subsample GP / SVGP checkpoint) are rebuilt on
# demand: whichever variant runs first for a (seed, dataset) trains them
# (deterministically — scripts/validate_regen.py showed the regen is
# bit-exact against results/uci_metrics_long.csv), and the second variant
# copies them. Supersedes run_r4_t2.sh / run_r4_eq.sh (sequential queues).
# Usage: [DATASETS="breast_wdbc wine_uci"] [SEEDS="0 1 ..."] ./run_r4_followup.sh
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
HEAD=$BASE/outputs_precond_smooth
LOG=$BASE/run_r4_followup.log
DATASETS=${DATASETS:-"breast_wdbc wine_uci"}
SEEDS=${SEEDS:-"0 1 2 3 4 5 6 7 8 9"}

copy_cache () {  # copy_cache <src_outputs_dir> <dst_outputs_dir> <dataset> <seed>
  local SRC=$1 DST=$2 ds=$3 seed=$4
  [ -d "$SRC/$seed/models/$ds" ] || return 0
  mkdir -p $DST/$seed/data $DST/$seed/models/$ds
  [ -d $DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $DST/$seed/data/$ds 2>/dev/null
  [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $DST/$seed/models/$ds/subsample_gp 2>/dev/null
  [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $SRC/$seed/models/$ds/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
}

run_variant () {  # run_variant <suffix> <dataset> <seed>
  local sfx=$1 ds=$2 seed=$3
  local DST=outputs_precond_smooth_$sfx
  # done-marker: the per-run metric CSVs
  [ -f $BASE/$DST/$seed/results/$ds/pls-onb/nll_test.csv ] && return 0
  copy_cache $HEAD $BASE/$DST $ds $seed
  echo "=== r4fu: variant=$sfx ds=$ds seed=$seed $(date)" >> "$LOG"
  timeout 5400 python $BASE/main.py \
    --config_path $BASE/config_precond_smooth_$sfx.yaml \
    --dataset "$ds" --data_seed "$seed" \
    --outputs_dirname $DST >> "$LOG" 2>&1
}

for seed in $SEEDS; do
  for ds in $DATASETS; do
    run_variant t2 $ds $seed
    # the t2 dir now holds this (seed, ds)'s deterministic cache — share it
    copy_cache $BASE/outputs_precond_smooth_t2 $BASE/outputs_precond_smooth_eq $ds $seed
    run_variant eq $ds $seed
    echo "r4fu done seed=$seed ds=$ds $(date)" >> "$LOG"
  done
done
echo "r4 followup ALL done $(date)" >> "$LOG"
