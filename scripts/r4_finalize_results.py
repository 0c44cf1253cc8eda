"""Round-4 results finalization: purge the headline protocols' archived rows
from the consolidated long CSV, then regenerate RESULTS.md from the fresh
outputs trees.

Why purge: ``dump_metrics_long`` merges fresh on-disk rows over archived ones
per key — correct for gap-fills, but after a FULL from-scratch rerun any key
the new sweep failed to produce would silently keep serving its round-3 value
(computed on the irreproducible pre-determinism stand-ins and, for SVGP
regression, with the frozen-noise trainer). Purging the affected protocols
first turns such a gap into a visibly missing cell instead of a stale one.

Run AFTER both sweeps complete:
    python scripts/r4_finalize_results.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
LONG = os.path.join(ROOT, "results", "uci_metrics_long.csv")

# protocols fully rerun in round 4 (fresh trees on the pinned data)
PURGE = {
    ("regression", "outputs_precond_map"),
    ("classification", "outputs_precond_smooth"),
}


def main() -> int:
    df = pd.read_csv(LONG)
    before = len(df)
    mask = df.apply(lambda r: (r["task"], r["protocol"]) in PURGE, axis=1)
    df = df[~mask]
    print(f"purged {before - len(df)} archived rows for {sorted(PURGE)}")
    df.to_csv(LONG, index=False)

    # regenerate from the fresh trees (also re-merges them into the CSV)
    sys.argv = ["make_results_summary"]
    from experiments.make_results_summary import main as render

    render()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
