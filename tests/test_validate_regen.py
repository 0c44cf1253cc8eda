"""scripts/validate_regen.py — the regen-reproducibility gate.

After the round-4 VM reset wiped the gitignored headline outputs trees, any
regenerated tree must REPRODUCE the committed long-CSV record (deterministic
sha256-pinned data + fixed seeds), otherwise the loss-attribution columns
would silently compare against a different baseline. These tests build a
tiny outputs tree FROM the committed record and check the script's verdicts:
exit 0 / "rows match" when values agree, exit 1 / "MISMATCH" when one cell
is perturbed beyond --atol, and missing-row accounting for absent files.
"""

import os
import subprocess
import sys

import pandas as pd
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "validate_regen.py")
LONG_CSV = os.path.join(ROOT, "results", "uci_metrics_long.csv")


def _committed_cells(protocol: str, n: int = 6) -> pd.DataFrame:
    committed = pd.read_csv(LONG_CSV)
    sub = committed[committed["protocol"] == protocol]
    if sub.empty:
        pytest.skip(f"no committed rows for protocol {protocol}")
    # one (dataset, seed) slice, a handful of metric rows
    first = sub.iloc[0]
    sub = sub[(sub["dataset"] == first["dataset"]) & (sub["seed"] == first["seed"])]
    return sub.head(n)


def _build_tree(tmp_path, cells: pd.DataFrame, perturb: int | None = None):
    """Materialise per-model metric CSVs in main.py's on-disk layout."""
    task = cells["task"].iloc[0]
    base = tmp_path / "experiments" / "uci" / task / cells["protocol"].iloc[0]
    for i, row in enumerate(cells.itertuples()):
        d = base / str(row.seed) / "results" / row.dataset / row.model
        d.mkdir(parents=True, exist_ok=True)
        value = row.value + (1.0 if perturb == i else 0.0)
        pd.DataFrame({"dataset": [row.dataset], row.model: [value]}).to_csv(
            d / f"{row.metric}_{row.split}.csv", index=False
        )
    return base


def _run(outputs_path) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, SCRIPT, str(outputs_path)],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )


def test_matching_tree_passes(tmp_path):
    cells = _committed_cells("outputs_precond_smooth")
    base = _build_tree(tmp_path, cells)
    proc = _run(base)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert f"{len(cells)} rows match" in proc.stdout


def test_perturbed_cell_fails(tmp_path):
    cells = _committed_cells("outputs_precond_smooth")
    base = _build_tree(tmp_path, cells, perturb=0)
    proc = _run(base)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "MISMATCH" in proc.stdout


def test_missing_rows_are_reported_not_failed(tmp_path):
    cells = _committed_cells("outputs_precond_smooth")
    base = _build_tree(tmp_path, cells.head(2))
    proc = _run(base)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "committed rows not on disk" in proc.stdout
