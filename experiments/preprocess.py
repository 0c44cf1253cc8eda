"""Data splitting and normalisation (reference ``experiments/preprocess.py``).

``split_regression_data_intervals`` holds out contiguous intervals of a 1-D
curve: randomly drawn interior intervals PLUS the two first/last intervals
always go to the test split (interpolation + edge extrapolation), exactly as
in the reference (``preprocess.py:9-113``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.model_selection import train_test_split

from experiments.data import Data, ExperimentData, ProblemType

Array = jax.Array


def split_regression_data_intervals(
    split_seed: int,
    x: Array,
    y: Array,
    number_of_test_intervals: int,
    total_number_of_intervals: int,
    y_untransformed: Array | None = None,
):
    """Returns (x_train, y_train, y_train_untransformed, x_test, y_test,
    y_test_untransformed)."""
    x_np = np.asarray(x)
    y_np = np.asarray(y)
    yu_np = None if y_untransformed is None else np.asarray(y_untransformed)

    n = x_np.shape[0]
    interval_size = n // total_number_of_intervals
    edge = max(int(total_number_of_intervals / 8), 3)
    rng = np.random.default_rng(split_seed)
    interior = rng.permutation(total_number_of_intervals - 2 * edge)[
        :number_of_test_intervals
    ] + edge
    # the reference always adds the two first and two last intervals to the
    # TEST set (extrapolation at the edges, preprocess.py:22-29)
    excluded = set(interior.tolist()) | {
        0,
        1,
        total_number_of_intervals - 2,
        total_number_of_intervals - 1,
    }

    def gather(arr, intervals):
        return np.concatenate(
            [arr[interval_size * i : interval_size * (i + 1)] for i in intervals]
        )

    train_intervals = [
        i for i in range(total_number_of_intervals) if i not in excluded
    ]
    test_intervals = [i for i in range(total_number_of_intervals) if i in excluded]

    x_train, y_train = gather(x_np, train_intervals), gather(y_np, train_intervals)
    x_test, y_test = gather(x_np, test_intervals), gather(y_np, test_intervals)
    y_train_u = None if yu_np is None else gather(yu_np, train_intervals)
    y_test_u = None if yu_np is None else gather(yu_np, test_intervals)
    return (
        jnp.asarray(x_train),
        jnp.asarray(y_train),
        None if y_train_u is None else jnp.asarray(y_train_u),
        jnp.asarray(x_test),
        jnp.asarray(y_test),
        None if y_test_u is None else jnp.asarray(y_test_u),
    )


def split_regression_data(
    seed: int,
    x: Array,
    y: Array,
    train_data_percentage: float,
    validation_data_percentage: float,
    test_data_percentage: float,
):
    """sklearn two-stage split (reference ``preprocess.py:116-151``)."""
    x_train, x_rest, y_train, y_rest = train_test_split(
        np.asarray(x), np.asarray(y), test_size=1 - train_data_percentage,
        random_state=seed,
    )
    x_validation, x_test, y_validation, y_test = train_test_split(
        x_rest, y_rest,
        test_size=test_data_percentage
        / (test_data_percentage + validation_data_percentage),
        random_state=seed,
    )
    return tuple(
        jnp.asarray(a)
        for a in (x_train, y_train, x_test, y_test, x_validation, y_validation)
    )


def set_up_experiment(
    name: str,
    problem_type: ProblemType,
    seed: int,
    x: Array,
    y: Array,
    train_data_percentage: float,
    normalise: bool = True,
    validation_data_percentage: float = 0.0,
) -> ExperimentData:
    """Split + y-normalisation (reference ``preprocess.py:153-216``)."""
    x_np, y_np = np.asarray(x), np.asarray(y)
    x_train, x_test, y_train, y_test = train_test_split(
        x_np, y_np,
        test_size=1 - (train_data_percentage + validation_data_percentage),
        random_state=seed,
    )
    if validation_data_percentage > 0:
        x_train, x_validation, y_train, y_validation = train_test_split(
            x_train, y_train,
            test_size=validation_data_percentage
            / (validation_data_percentage + train_data_percentage),
            random_state=seed,
        )
    else:
        x_validation, y_validation = None, None

    if normalise:
        y_mean = float(np.mean(y_train))
        y_std = float(np.std(y_train, ddof=1))
        y_np = (y_np - y_mean) / y_std
        y_train = (y_train - y_mean) / y_std
        y_test = (y_test - y_mean) / y_std
        if y_validation is not None:
            y_validation = (y_validation - y_mean) / y_std
    else:
        y_mean, y_std = 0.0, 1.0

    return ExperimentData(
        name=name,
        problem_type=problem_type,
        full=Data(x=jnp.asarray(x_np), y=jnp.asarray(y_np), name="full"),
        train=Data(x=jnp.asarray(x_train), y=jnp.asarray(y_train), name="train"),
        validation=(
            Data(x=jnp.asarray(x_validation), y=jnp.asarray(y_validation), name="validation")
            if validation_data_percentage > 0
            else None
        ),
        test=Data(x=jnp.asarray(x_test), y=jnp.asarray(y_test), name="test"),
        y_mean=y_mean,
        y_std=y_std,
    )
