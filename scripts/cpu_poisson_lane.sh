#!/bin/bash
# CPU lane for the Poisson head-to-head study (round-5): the study's config
# is light enough for the 1-core host (<=1e5 Langevin steps, 3 LR searches),
# so it runs here while the chip queue owns the TPU. Seed-major via the
# study's own loop; per-(curve,seed) cells self-skip against the committed
# results/poisson_study_long.csv, so restarts resume. fp32 CPU matches the
# chip protocol dtype.
# Usage: nohup scripts/cpu_poisson_lane.sh > queue_r5/cpu_lane.log 2>&1 &
cd /root/repo
export PLST_X64=0
export PLST_PLATFORM=cpu
export PYTHONPATH=/root/repo:/root/.axon_site
echo $$ > /tmp/cpu_lane.pid
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 21600 ))}  # default: +6h
for seed in 0 1 2 3 4 5 6 7 8 9; do
  [ "$(date +%s)" -ge "$DEADLINE_TS" ] && { echo "cpu-lane: deadline $(date)"; break; }
  echo "=== cpu-lane: poisson-study seed=$seed $(date)"
  nice -n 10 timeout 21600 python experiments/curves/poisson_regression/study.py \
    --config_path experiments/curves/poisson_regression/config.yaml \
    --seeds $seed || echo "cpu-lane: seed=$seed FAILED rc=$?"
done
echo "cpu-lane exited $(date)"
