"""Dataset-fetch story: schema resolution, frame normalisation, and the
offline sklearn-bundled real datasets (fetch_datasets.py). The network
fetchers themselves need egress; their pure normalisation/validation logic is
exercised here with fabricated frames."""

import numpy as np
import pandas as pd
import pytest

from experiments.uci import constants
from experiments.uci.fetch_datasets import (
    EXPECTED_ROWS,
    FETCHERS,
    normalise,
    write_sklearn_bundled,
)


def test_resolve_schema_reference_and_extra():
    assert constants.resolve_schema("boston").output_column_name == "medv"
    assert constants.resolve_schema("rice").output_column_name == "Class"
    assert len(constants.resolve_schema("breast_wdbc").input_column_names) == 30
    assert constants.resolve_schema("diabetes_sklearn").output_column_name == "target"
    with pytest.raises(KeyError):
        constants.resolve_schema("nope")


def test_fetcher_registry_covers_reference_dataset_list():
    want = {d.value for d in constants.RegressionDatasetSchema} | {
        d.value for d in constants.ClassificationDatasetSchema
    }
    assert set(FETCHERS) == want
    assert set(EXPECTED_ROWS) == want


def test_normalise_case_and_space_insensitive():
    # wine_quality schema has spaced names like "fixed acidity"; feed a frame
    # with different case/spacing plus an extra column and a NaN row
    schema = constants.resolve_schema("wine_quality")
    n = EXPECTED_ROWS["wine_quality"]
    rng = np.random.default_rng(0)
    raw = {
        c.upper().replace(" ", ""): rng.normal(size=n + 1)
        for c in schema.input_column_names
    }
    raw["QUALITY"] = rng.integers(3, 9, size=n + 1).astype(float)
    raw["extra_junk"] = rng.normal(size=n + 1)
    df = pd.DataFrame(raw)
    df.loc[0, "QUALITY"] = np.nan  # dropped -> exactly EXPECTED_ROWS rows
    out = normalise("wine_quality", df)
    assert list(out.columns) == list(schema.input_column_names) + ["quality"]
    assert len(out) == n


def test_normalise_rejects_wrong_row_count_and_missing_column():
    schema = constants.resolve_schema("boston")
    cols = {c: np.zeros(10) for c in schema.input_column_names}
    cols["medv"] = np.zeros(10)
    with pytest.raises(ValueError, match="rows"):
        normalise("boston", pd.DataFrame(cols))  # 10 != ~506
    bad = pd.DataFrame({c: np.zeros(506) for c in schema.input_column_names[:-1]})
    bad["medv"] = np.zeros(506)
    with pytest.raises(KeyError):
        normalise("boston", bad)


def test_sklearn_bundled_real_data(tmp_path):
    write_sklearn_bundled(str(tmp_path))
    wdbc = pd.read_csv(tmp_path / "breast_wdbc.csv")
    schema = constants.resolve_schema("breast_wdbc")
    assert set(schema.input_column_names) <= set(wdbc.columns)
    assert len(wdbc) == 569  # the real UCI WDBC row count
    assert set(wdbc["target"].unique()) == {0, 1}
    diab = pd.read_csv(tmp_path / "diabetes_sklearn.csv")
    schema = constants.resolve_schema("diabetes_sklearn")
    assert set(schema.input_column_names) <= set(diab.columns)
    assert len(diab) == 442  # the real diabetes study row count
    iris = pd.read_csv(tmp_path / "iris_binary.csv")
    schema = constants.resolve_schema("iris_binary")
    assert set(schema.input_column_names) <= set(iris.columns)
    assert len(iris) == 100  # versicolor + virginica only
    assert sorted(iris["target"].unique()) == [0, 1]
    assert iris["target"].sum() == 50  # balanced pair
    # real REGRESSION tasks derived from the same bundled measurements
    wine_alc = pd.read_csv(tmp_path / "wine_alcohol.csv")
    schema = constants.resolve_schema("wine_alcohol")
    assert set(schema.input_column_names) <= set(wine_alc.columns)
    assert len(wine_alc) == 178  # the real UCI wine row count
    assert "target" not in wine_alc.columns  # cultivar label dropped
    assert wine_alc["alcohol"].between(11, 15).all()  # raw % vol target
    iris_pet = pd.read_csv(tmp_path / "iris_petal.csv")
    schema = constants.resolve_schema("iris_petal")
    assert set(schema.input_column_names) <= set(iris_pet.columns)
    assert len(iris_pet) == 150  # all three species kept
    assert iris_pet["petal_length_cm"].between(0.5, 8).all()  # raw cm target


def test_pin_and_verify_roundtrip(tmp_path, monkeypatch, capsys):
    """--pin hashes every CSV into checksums.json; --verify passes on intact
    files, fails (exit 1) on a mutated one; the synthetic generator is
    process-deterministic (sha256-digest seeds, NOT Python hash())."""
    import subprocess
    import sys

    from experiments.uci import fetch_datasets as fd

    (tmp_path / "a.csv").write_text("x,y\n1,2\n")
    (tmp_path / "b.csv").write_text("x,y\n3,4\n")

    monkeypatch.setattr(
        sys, "argv", ["fetch_datasets.py", "--out", str(tmp_path), "--pin"]
    )
    assert fd.main() == 0
    monkeypatch.setattr(
        sys, "argv", ["fetch_datasets.py", "--out", str(tmp_path), "--verify"]
    )
    assert fd.main() == 0
    (tmp_path / "b.csv").write_text("x,y\n3,5\n")  # mutate
    assert fd.main() == 1
    (tmp_path / "b.csv").unlink()  # missing
    assert fd.main() == 1


def test_synthetic_generator_is_process_deterministic(tmp_path):
    """Two generations must be byte-identical — the round-3 generator seeded
    via hash(name) (randomised per process) and silently produced different
    data on every regeneration."""
    import hashlib

    from experiments.uci.make_synthetic_datasets import main as synth_main

    out1, out2 = tmp_path / "g1", tmp_path / "g2"
    synth_main(rows=50, out_dir=str(out1))
    synth_main(rows=50, out_dir=str(out2))
    for f in sorted(out1.iterdir()):
        h1 = hashlib.sha256(f.read_bytes()).hexdigest()
        h2 = hashlib.sha256((out2 / f.name).read_bytes()).hexdigest()
        assert h1 == h2, f.name
