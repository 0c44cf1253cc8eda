#!/bin/bash
# Follow-on TPU queue: waits for the primary queue, then extras2 + TPU test
# lane + bench table.
cd /root/repo
while kill -0 $(cat /tmp/queue.pid) 2>/dev/null; do sleep 60; done
./run_r3_extras2.sh
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p results
echo "=== test-tpu $(date)" > results/tpu_test_lane.log
PLS_TPU_TESTS=1 python -m pytest tests/ -m tpu -q >> results/tpu_test_lane.log 2>&1
echo "=== bench table $(date)" > /tmp/bench_r3.log
python bench.py --table >> /tmp/bench_r3.log 2>&1
python bench.py >> /tmp/bench_r3.log 2>&1
echo "queue2 done $(date)" >> /tmp/r3_queue.log
