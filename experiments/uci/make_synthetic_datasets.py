"""Generate schema-compatible synthetic UCI stand-in CSVs.

The reference expects real UCI CSVs at ``experiments/uci/datasets/<name>.csv``
but does not ship them (SURVEY.md §0). In network-restricted environments
this script fabricates datasets with the exact column schemas of
``constants.py`` so the full UCI pipeline is runnable end-to-end: inputs are
correlated Gaussians; regression targets come from a random smooth function
(sum of a few RBF bumps) + noise; classification targets from a logistic
model on the same.

Usage: python experiments/uci/make_synthetic_datasets.py [--rows 1000] [--out DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pandas as pd

from experiments.uci.constants import (
    DATASET_SCHEMA_MAPPING,
    ClassificationDatasetSchema,
    RegressionDatasetSchema,
)


def _latent(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """A random smooth function of the inputs: k RBF bumps."""
    n, d = x.shape
    k = 8
    centres = rng.normal(size=(k, d))
    weights = rng.normal(size=k) * 2.0
    lengthscale = np.sqrt(d)
    d2 = ((x[:, None, :] - centres[None, :, :]) / lengthscale) ** 2
    return np.exp(-0.5 * d2.sum(-1)) @ weights


def make_dataset(schema, rows: int, rng: np.random.Generator, classification: bool) -> pd.DataFrame:
    d = len(schema.input_column_names)
    # correlated inputs
    mixing = rng.normal(size=(d, d)) / np.sqrt(d)
    x = rng.normal(size=(rows, d)) @ mixing
    f = _latent(x, rng)
    if classification:
        p = 1.0 / (1.0 + np.exp(-3.0 * (f - np.median(f))))
        y = (rng.uniform(size=rows) < p).astype(int)
    else:
        y = f + 0.1 * np.std(f) * rng.normal(size=rows)
    df = pd.DataFrame(x, columns=schema.input_column_names)
    df[schema.output_column_name] = y
    return df


def main(rows: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name_enum in list(RegressionDatasetSchema) + list(ClassificationDatasetSchema):
        schema = DATASET_SCHEMA_MAPPING[name_enum]
        # Stable digest, NOT Python hash(): str hashing is randomised per
        # process (PYTHONHASHSEED), which silently made every regeneration a
        # DIFFERENT dataset — discovered in round 4 when the wiped CSVs could
        # not be reproduced. sha256 pins in checksums.json guard this now.
        seed = int.from_bytes(
            hashlib.sha256(name_enum.value.encode()).digest()[:4], "little"
        )
        rng = np.random.default_rng(seed)
        df = make_dataset(
            schema,
            rows,
            rng,
            classification=isinstance(name_enum, ClassificationDatasetSchema),
        )
        path = os.path.join(out_dir, f"{name_enum.value}.csv")
        df.to_csv(path, index=False)
        print(f"wrote {path} ({rows} rows, {df.shape[1]} cols) [SYNTHETIC]")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1000)
    parser.add_argument(
        "--out",
        type=str,
        default=os.path.join(os.path.dirname(os.path.realpath(__file__)), "datasets"),
    )
    args = parser.parse_args()
    main(args.rows, args.out)
