"""Validate a regenerated outputs tree against the committed long CSV.

After the round-4 VM reset wiped the gitignored ``outputs_precond_smooth``
tree (model checkpoints + per-seed metric CSVs), the headline record
survives only in ``results/uci_metrics_long.csv``. The loss-attribution
follow-ups (T=2, spread-equilibration, J=1000 seed fill) and the validated
mechanism probe (``analyse_gap.py``) all key off that tree, so it must be
regenerated — and the regeneration must REPRODUCE the committed record
(deterministic sha256-pinned data + fixed seeds + same backend), otherwise
the paired columns would silently compare against a different baseline.

Usage:
    PYTHONPATH=. python scripts/validate_regen.py \
        experiments/uci/classification/outputs_precond_smooth \
        [--datasets breast_wdbc wine_uci] [--seeds 0 1 ...] [--atol 2e-3]

Exits 0 iff every committed (dataset, model, metric, split, seed) row that
the regenerated tree also contains matches within --atol, and reports any
committed rows the tree is missing.
"""

from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
LONG_CSV = os.path.join(ROOT, "results", "uci_metrics_long.csv")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("outputs_path")
    parser.add_argument("--datasets", nargs="*", default=None)
    parser.add_argument("--seeds", nargs="*", type=int, default=None)
    parser.add_argument("--atol", type=float, default=2e-3)
    args = parser.parse_args()

    norm = os.path.normpath(os.path.realpath(args.outputs_path))
    protocol = os.path.basename(norm)
    task = os.path.basename(os.path.dirname(norm))
    committed = pd.read_csv(LONG_CSV)
    committed = committed[
        (committed["task"] == task) & (committed["protocol"] == protocol)
    ]
    if args.datasets:
        committed = committed[committed["dataset"].isin(args.datasets)]
    if args.seeds is not None:
        committed = committed[committed["seed"].isin(args.seeds)]
    if committed.empty:
        print(f"no committed rows for task={task} protocol={protocol}")
        return 1

    n_match = n_mismatch = n_missing = 0
    worst = (0.0, None)
    for row in committed.itertuples():
        path = os.path.join(
            norm,
            str(row.seed),
            "results",
            row.dataset,
            row.model,
            f"{row.metric}_{row.split}.csv",
        )
        if not os.path.exists(path):
            n_missing += 1
            continue
        fresh = float(pd.read_csv(path)[row.model].iloc[0])
        diff = abs(fresh - row.value)
        if diff > args.atol:
            n_mismatch += 1
            print(
                f"MISMATCH {row.dataset}/{row.model}/{row.metric}_{row.split}"
                f" seed={row.seed}: committed={row.value:.6f} fresh={fresh:.6f}"
                f" |d|={diff:.2e}"
            )
        else:
            n_match += 1
        if diff > worst[0]:
            worst = (diff, f"{row.dataset}/{row.model}/{row.metric} seed={row.seed}")
    print(
        f"{protocol}: {n_match} rows match (atol={args.atol:g}),"
        f" {n_mismatch} mismatch, {n_missing} committed rows not on disk;"
        f" worst |d|={worst[0]:.2e} at {worst[1]}"
    )
    return 1 if n_mismatch else 0


if __name__ == "__main__":
    sys.exit(main())
