"""Merge freshly-written per-seed metric CSVs into the committed long CSV.

Round-4 lesson: the gitignored ``outputs_*`` trees are wiped by VM resets
between rounds, so any finished cell whose metrics were not merged into
``results/uci_metrics_long.csv`` (committed) is silently lost. The round-5
queue calls this after EVERY cell instead of only at sweep end.

Deliberately calls ``dump_metrics_long`` alone (not the full RESULTS.md
renderer, which is heavy and should only run once the sweeps settle).
"""

from __future__ import annotations

from experiments.make_results_summary import dump_metrics_long

if __name__ == "__main__":
    dump_metrics_long()
