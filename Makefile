# One-command entry points for the numbers the repo publishes
# (VERDICT r2 #8: bench + results regeneration without hand-carried steps).
#
#   make bench     — headline bench (one JSON line) + the per-tier/cost table
#                    (BENCH_TABLE.json); runs on whatever backend JAX finds
#                    (the real TPU under axon, CPU elsewhere)
#   make results   — regenerate RESULTS.md; works from a CLEAN CLONE: the
#                    gitignored per-seed outputs trees fall back to the
#                    committed results/uci_metrics_long.csv and
#                    results/section_snapshots/, and fresh partial reruns
#                    merge into (never clobber) that record
#   make test      — default (CPU, fp64, 8 virtual devices) test lane
#   make test-tpu  — hardware lane: fused-kernel stochastic-law tests on the
#                    real chip (writes results/tpu_test_lane.log)
#
# PYTHONPATH note: /root/.axon_site must stay on the path or the axon TPU
# plugin cannot register (see .claude/skills/verify/SKILL.md).

PY := PYTHONPATH=$(CURDIR):/root/.axon_site python

.PHONY: bench results test test-tpu

bench:
	$(PY) bench.py
	$(PY) bench.py --table
	$(PY) bench.py --predict

results:
	$(PY) experiments/make_results_summary.py

test:
	$(PY) -m pytest tests/ -q

test-tpu:
	mkdir -p results
	PLS_TPU_TESTS=1 $(PY) -m pytest tests/ -m tpu -q 2>&1 | tee results/tpu_test_lane.log
