#!/bin/bash
# Round-5 master chip queue (single TPU, serial). Differences vs the
# round-4 queue that lost work:
#   * per-cell RETRY (up to 3 attempts) — the axon tunnel flakes with
#     transient FAILED_PRECONDITION TPU backend errors (see
#     run_r4_followup.log, wine_uci seed 2) and a retried cell resumes
#     from its on-disk caches;
#   * per-cell MERGE into the committed results/uci_metrics_long.csv
#     (scripts/merge_cell.py) so a VM wipe can never lose a finished cell;
#   * CSV done-markers — a (protocol, dataset, seed) cell already in the
#     committed long CSV is skipped even though its gitignored tree is gone;
#   * dynamic stages — executes queue_r5/*.task files in sorted order and
#     keeps polling for new ones until queue_r5/STOP exists or DEADLINE_TS
#     passes, so stages can be enqueued while the queue runs.
# Usage: DEADLINE_TS=<epoch-seconds> ./run_r5_queue.sh
cd /root/repo
export PLST_X64=0
export PYTHONPATH=/root/repo:/root/.axon_site
QDIR=/root/repo/queue_r5
LOG=$QDIR/queue.log
mkdir -p $QDIR
echo $$ > /tmp/r5_queue.pid
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 39600 ))}  # default: +11h

past_deadline () { [ "$(date +%s)" -ge "$DEADLINE_TS" ]; }

# --- shared helpers (task files call these) --------------------------------

# cell_done <task> <protocol> <dataset> <seed> [model]
cell_done () {
  python - "$1" "$2" "$3" "$4" "${5:-pls-onb}" <<'EOF'
import sys
import pandas as pd
task, protocol, ds, seed, model = sys.argv[1:6]
try:
    d = pd.read_csv("results/uci_metrics_long.csv")
except Exception:
    sys.exit(1)
hit = (
    (d.task == task) & (d.protocol == protocol) & (d.dataset == ds)
    & (d.model == model) & (d.metric == "nll") & (d.split == "test")
    & (d.seed == int(seed))
).any()
sys.exit(0 if bool(hit) else 1)
EOF
}

# copy_caches <task> <dst_outputs_dirname> <dataset> <seed>
# reuse splits / subsample-GP kernels / SVGP checkpoints from ANY sibling
# outputs tree of the same task that already has them (deterministic, so
# every tree would recompute the identical artifacts)
copy_caches () {
  local task=$1 DST=$2 ds=$3 seed=$4 BASE=experiments/uci/$1
  for SRC in $BASE/outputs_precond_smooth $BASE/outputs_precond_smooth_t2 \
             $BASE/outputs_precond_smooth_eq $BASE/outputs_precond_map \
             $BASE/outputs_precond_map_eq; do
    [ "$SRC" = "$BASE/$DST" ] && continue
    [ -d "$SRC/$seed/models/$ds" ] || continue
    mkdir -p $BASE/$DST/$seed/data $BASE/$DST/$seed/models/$ds
    [ -d $BASE/$DST/$seed/data/$ds ] || cp -r $SRC/$seed/data/$ds $BASE/$DST/$seed/data/$ds 2>/dev/null
    [ -d $BASE/$DST/$seed/models/$ds/subsample_gp ] || cp -r $SRC/$seed/models/$ds/subsample_gp $BASE/$DST/$seed/models/$ds/subsample_gp 2>/dev/null
    for f in svgp.pkl svgp_student.pkl; do
      [ -f $BASE/$DST/$seed/models/$ds/$f ] || cp $SRC/$seed/models/$ds/$f $BASE/$DST/$seed/models/$ds/$f 2>/dev/null
    done
  done
}

# run_cell <task> <config_name> <outputs_dirname> <dataset> <seed>
run_cell () {
  local task=$1 cfg=$2 DST=$3 ds=$4 seed=$5 BASE=experiments/uci/$1
  cell_done $task $DST $ds $seed && { echo "skip (committed): $task/$DST $ds seed=$seed" >> $LOG; return 0; }
  copy_caches $task $DST $ds $seed
  local attempt rc
  for attempt in 1 2 3; do
    past_deadline && return 1
    echo "=== r5q: task=$task cfg=$cfg ds=$ds seed=$seed attempt=$attempt $(date)" >> $LOG
    timeout 5400 python $BASE/main.py \
      --config_path $BASE/$cfg.yaml \
      --dataset "$ds" --data_seed "$seed" \
      --outputs_dirname $DST >> $LOG 2>&1
    rc=$?
    # merge whatever landed (pls + svgp rows) into the committed long CSV
    JAX_PLATFORMS=cpu python scripts/merge_cell.py >> $LOG 2>&1
    if cell_done $task $DST $ds $seed; then
      echo "r5q cell OK: $task/$DST $ds seed=$seed (rc=$rc)" >> $LOG
      return 0
    fi
    echo "r5q cell FAILED (rc=$rc): $task/$DST $ds seed=$seed — retrying" >> $LOG
    sleep 20
  done
  echo "r5q cell GAVE UP: $task/$DST $ds seed=$seed" >> $LOG
  return 1
}

export -f past_deadline cell_done copy_caches run_cell 2>/dev/null

# --- dynamic stage loop -----------------------------------------------------
while true; do
  past_deadline && { echo "r5q: deadline reached $(date)" >> $LOG; break; }
  [ -f $QDIR/STOP ] && { echo "r5q: STOP file $(date)" >> $LOG; break; }
  NEXT=""
  for t in $(ls $QDIR/*.task 2>/dev/null | sort); do
    [ -f "$t.done" ] && continue
    NEXT=$t; break
  done
  if [ -z "$NEXT" ]; then
    sleep 60
    continue
  fi
  echo "r5q: starting stage $NEXT $(date)" >> $LOG
  source "$NEXT"
  touch "$NEXT.done"
  echo "r5q: finished stage $NEXT $(date)" >> $LOG
done
echo "r5 queue exited $(date)" >> $LOG
