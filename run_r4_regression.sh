#!/bin/bash
# Round-4 headline regression sweep on the round-4 deterministic (sha256-
# pinned) stand-in data, with the FIXED SVGP trainer (learnable noise) and
# the hardened MAP mean-constant fitter. TPU fp32, full 12-variant protocol,
# 7 datasets (6 reference stand-ins + diabetes_sklearn REAL) x 10 seeds.
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
REG=experiments/uci/regression/main.py
RCFG=experiments/uci/regression/config_precond_map.yaml
LOG=experiments/uci/regression/run_r4_map.log
echo "=== r4 regression map sweep (fresh data, fixed svgp) $(date)" >> $LOG
python $REG --config_path $RCFG --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "=== r4 regression map extras: diabetes_sklearn $(date)" >> $LOG
python $REG --config_path $RCFG --dataset diabetes_sklearn --outputs_dirname outputs_precond_map >> $LOG 2>&1
echo "r4 regression sweep done $(date)" >> /tmp/r4/queue.log
