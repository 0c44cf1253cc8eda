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
