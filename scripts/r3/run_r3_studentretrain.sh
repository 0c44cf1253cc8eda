#!/bin/bash
# Retrain the headline-dir (outputs_precond_map) pls-student-onb cells whose
# checkpoints predate commit 3412c8d's MAP mean-constant fitter hardening.
#
# Why: the pre-hardening Newton iteration had no descent-direction check, and
# the Student-T cost's indefinite Hessian sent it toward an ascent direction —
# the backtracking line search then never found a decrease and the fit
# returned m0 ~ 1e-7 (checkpoints record it) instead of the true MAP constant
# (e.g. concrete seed 0: m0=4.01). Training against the degenerate m0=0 prior
# mean cost the student column 0.3-2 nats everywhere and produced two
# catastrophic concrete cells (seed 1: NLL 28.3, seed 8: 15.2). Retraining
# concrete seed 0 with the fixed fitter moved test NLL 0.32 -> -0.21.
# Gaussian cells are untouched: the Gaussian cost is convex, so the old
# Newton iteration was already correct for them (committed gaussian m0 values
# match fresh fits).
#
# Resumable: each finished cell writes models/<ds>/pls-student-onb.m0fix so a
# relaunch (e.g. on the TPU after the tunnel returns) skips completed cells.
# Priority order: catastrophic cells first, then small datasets, then the two
# subsample-5000 datasets (CPU-infeasible; intended for the TPU pass).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_queue.log
REG=experiments/uci/regression
DIR=$REG/outputs_precond_map

cell() { # seed dataset
  local seed=$1 ds=$2
  local mdir=$DIR/$seed/models/$ds
  [ -f "$mdir/pls-student-onb.m0fix" ] && return 0
  [ -f "$mdir/pls-student-onb.pkl" ] || return 0 # never existed: skip
  mv "$mdir/pls-student-onb.pkl" "$mdir/pls-student-onb.pkl.degenerate_m0"
  if timeout 14000 python $REG/main.py --config_path $REG/config_precond_map.yaml \
      --outputs_dirname outputs_precond_map --data_seed "$seed" --dataset "$ds" \
      --models pls-student-onb >>/tmp/r3_studentretrain.log 2>&1 \
      && [ -f "$mdir/pls-student-onb.pkl" ]; then
    touch "$mdir/pls-student-onb.m0fix"
    rm -f "$mdir/pls-student-onb.pkl.degenerate_m0"
    echo "studentretrain $ds seed $seed done $(date -u)" >>$LOG
  else
    # failed or timed out: restore the old checkpoint so the table keeps a row
    [ -f "$mdir/pls-student-onb.pkl" ] || mv "$mdir/pls-student-onb.pkl.degenerate_m0" "$mdir/pls-student-onb.pkl"
    echo "studentretrain FAIL $ds seed $seed $(date -u)" >>$LOG
  fi
}

# catastrophic first
cell 1 concrete
cell 8 concrete
# small datasets, all seeds
for s in 0 2 3 4 5 6 7 9; do cell "$s" concrete; done
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" boston; done
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" diabetes_sklearn; done
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" energy_cooling; done
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" energy_heating; done
# subsample-5000 datasets last (TPU pass)
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" kin8nm; done
for s in 0 1 2 3 4 5 6 7 8 9; do cell "$s" wine_quality; done
echo "studentretrain sweep DONE $(date -u)" >>$LOG
