#!/bin/bash
# Recompute UCI regression Student-T metrics from cached checkpoints after
# the fp32 log-normalizer fix (commit 6c7299d): every svgp-student /
# pls-student NLL CSV on disk was computed with the catastrophically
# cancelling on-device lgamma difference (~14 nats at the df~1e12 that
# scipy.stats.t.fit returns on near-Gaussian residuals), and the
# svgp-student marginal now folds the latent variance in by moment
# matching (affects its temper/conformalise variants too).
#
# Gaussian-model metrics are untouched by the fix, so every pass runs with
# --models restricted to the student checkpoints that exist in the cell —
# nothing retrains (an un-checkpointed model would trigger its multi-hour
# step-size search).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PLST_PLATFORM=cpu
LOG=/tmp/r3_queue.log
REG=experiments/uci/regression

run_cell() { # dir config seed dataset models
  local dir=$1 cfg=$2 seed=$3 ds=$4 models=$5
  timeout 1200 python $REG/main.py --config_path $REG/$cfg \
    --outputs_dirname "$dir" --data_seed "$seed" --dataset "$ds" \
    --models "$models" >>/tmp/r3_studentfix.log 2>&1 ||
    echo "studentfix FAIL $dir $seed $ds" >>$LOG
}

for pair in \
  "outputs_precond_map:config_precond_map.yaml" \
  "outputs:config.yaml" \
  "outputs_precond:config_precond.yaml" \
  "outputs_round1_medium:config.yaml" \
  "outputs_parallel:config_parallel.yaml" \
  "outputs_nystrom:config_nystrom.yaml"; do
  dir=${pair%%:*}
  cfg=${pair##*:}
  for seeddir in $REG/$dir/[0-9]*; do
    [ -d "$seeddir" ] || continue
    seed=$(basename "$seeddir")
    for mdir in "$seeddir"/models/*/; do
      [ -d "$mdir" ] || continue
      ds=$(basename "$mdir")
      models=""
      [ -f "$mdir/pls-student-onb.pkl" ] && models="pls-student-onb"
      [ -f "$mdir/svgp-student.pkl" ] && models="${models:+$models,}svgp-student"
      [ -n "$models" ] && run_cell "$dir" "$cfg" "$seed" "$ds" "$models"
    done
    echo "studentfix $dir seed $seed done $(date -u)" >>$LOG
  done
done
echo "studentfix sweep DONE $(date -u)" >>$LOG
