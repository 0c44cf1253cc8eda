#!/bin/bash
# Round-4 loss-attribution follow-ups, interleaved (supersedes run_r4_t2.sh /
# run_r4_eq.sh): the round-4 VM reset wiped the gitignored headline outputs
# tree, so for the first PROBE_SEEDS this queue (1) regenerates the headline
# (dataset, seed) cell — bit-exact against the committed long CSV,
# scripts/validate_regen.py — then (2) runs the validated mechanism probe
# (analyse_gap.py) ON THE SWEEP'S BACKEND (the chip; a CPU probe of a
# TPU-trained checkpoint misses the committed NLL by ~1e-3 of predict-path
# matmul rounding and correctly fails the validation gate), then (3) runs the
# T=2 and spread-equilibration variants. Later seeds run only (3). The
# per-seed interleave means an early cut-off leaves an even seed-prefix in
# BOTH attribution columns (the paired-by-seed deltas in
# make_results_summary.loss_attribution_section use the seed intersection).
# Variants rebuild their caches from the headline tree when present, else
# from each other; everything is deterministic (sha256-pinned data).
# Usage: [DATASETS=...] [SEEDS=...] [PROBE_SEEDS="0 1 2"] ./run_r4_followup.sh
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
HEAD=$BASE/outputs_precond_smooth
LOG=$BASE/run_r4_followup.log
DATASETS=${DATASETS:-"breast_wdbc wine_uci"}
SEEDS=${SEEDS:-"0 1 2 3 4 5 6 7 8 9"}
PROBE_SEEDS=${PROBE_SEEDS:-"0"}

copy_cache () {  # copy_cache <src_outputs_dir> <dst_outputs_dir> <dataset> <seed>
  local SRC=$1 DST=$2 ds=$3 seed=$4
  [ -d "$SRC/$seed/models/$ds" ] || return 0
  mkdir -p $DST/$seed/data $DST/$seed/models/$ds
  [ -d $DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $DST/$seed/data/$ds 2>/dev/null
  [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $DST/$seed/models/$ds/subsample_gp 2>/dev/null
  [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $SRC/$seed/models/$ds/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
}

run_config () {  # run_config <config_name> <outputs_dirname> <dataset> <seed>
  local cfg=$1 DST=$2 ds=$3 seed=$4
  [ -f $BASE/$DST/$seed/results/$ds/pls-onb/nll_test.csv ] && return 0
  copy_cache $HEAD $BASE/$DST $ds $seed
  copy_cache $BASE/outputs_precond_smooth_t2 $BASE/$DST $ds $seed
  echo "=== r4fu: cfg=$cfg ds=$ds seed=$seed $(date)" >> "$LOG"
  timeout 5400 python $BASE/main.py \
    --config_path $BASE/$cfg.yaml \
    --dataset "$ds" --data_seed "$seed" \
    --outputs_dirname $DST >> "$LOG" 2>&1
}

probe () {  # probe <dataset> <seed> — mechanism probe on the sweep's backend
  local ds=$1 seed=$2
  # done-marker: a validated probe row already in the committed CSV
  python -c "import pandas as pd, sys; d = pd.read_csv('results/gap_attribution.csv'); sys.exit(0 if bool(((d.dataset == '$ds') & (d.seed == $seed) & d.validated).any()) else 1)" 2>/dev/null && return 0
  echo "=== r4fu: probe ds=$ds seed=$seed $(date)" >> "$LOG"
  python scripts/validate_regen.py $HEAD --datasets $ds --seeds $seed >> "$LOG" 2>&1
  PLST_PLATFORM=axon timeout 3600 python $BASE/analyse_gap.py \
    --datasets $ds --seeds $seed >> "$LOG" 2>&1
}

for seed in $SEEDS; do
  for ds in $DATASETS; do
    if echo " $PROBE_SEEDS " | grep -q " $seed "; then
      run_config config_precond_smooth outputs_precond_smooth $ds $seed
      probe $ds $seed
    fi
    run_config config_precond_smooth_t2 outputs_precond_smooth_t2 $ds $seed
    run_config config_precond_smooth_eq outputs_precond_smooth_eq $ds $seed
    echo "r4fu done seed=$seed ds=$ds $(date)" >> "$LOG"
  done
done
echo "r4 followup ALL done $(date)" >> "$LOG"
