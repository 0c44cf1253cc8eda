#!/bin/bash
# Fill the ablation table's missing cells for the three newest REAL datasets
# (digits_even, wine_uci, iris_binary):
#   1. reference-protocol column (config.yaml -> outputs/) for all three
#   2. +nystrom+precond column (config_precond.yaml -> outputs_precond) for iris
#   3. +m0 MAP column (config_precond_map.yaml -> outputs_precond_map) for iris
# The kernel/inducing/data/svgp config sections are byte-identical across
# these configs and config_precond_smooth.yaml (verified by diff), so the
# completed smooth_cpu sweep's cached experiment data, subsample-GP kernels
# and SVGP checkpoints are pre-seeded — each run trains only the PLS model.
# Host-CPU fp32, same provenance note as the smooth sweep (PARITY.md).
cd /root/repo
export PLST_PLATFORM=cpu PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=experiments/uci/classification
SRC=$BASE/outputs_precond_smooth_cpu
LOG=$BASE/run_r3_ablfill.log

seed_cache () {  # seed_cache <dst_outputs_dirname> <dataset> <seed>
  local DST=$BASE/$1 ds=$2 seed=$3
  mkdir -p $DST/$seed/data $DST/$seed/models/$ds
  [ -d $DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $DST/$seed/data/$ds 2>/dev/null
  [ -d $DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $DST/$seed/models/$ds/subsample_gp 2>/dev/null
  [ -f $DST/$seed/models/$ds/svgp.pkl ] || cp $SRC/$seed/models/$ds/svgp.pkl $DST/$seed/models/$ds/svgp.pkl 2>/dev/null
}

run_cell () {  # run_cell <config> <outputs_dirname> <dataset> <seed>
  echo "=== ablfill: cfg=$1 ds=$3 seed=$4 $(date)" >> "$LOG"
  seed_cache "$2" "$3" "$4"
  nice -n 19 timeout 5400 python $BASE/main.py --config_path $BASE/$1 \
    --dataset "$3" --data_seed "$4" --outputs_dirname "$2" >> "$LOG" 2>&1
}

for seed in 0 1 2 3 4 5 6 7 8 9; do
  for ds in iris_binary digits_even wine_uci; do
    run_cell config.yaml outputs $ds $seed
  done
done
echo "ablfill reference column done $(date)" >> /tmp/r3_queue.log
for seed in 0 1 2 3 4 5 6 7 8 9; do
  run_cell config_precond.yaml outputs_precond iris_binary $seed
done
echo "ablfill iris precond done $(date)" >> /tmp/r3_queue.log
for seed in 0 1 2 3 4 5 6 7 8 9; do
  run_cell config_precond_map.yaml outputs_precond_map iris_binary $seed
done
echo "ablfill done $(date)" >> /tmp/r3_queue.log
