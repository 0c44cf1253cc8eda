"""Metrics + CSV observability layer (reference ``experiments/metrics.py``).

Metric dispatch mirrors the reference's isinstance chains over predictive
distribution types; results land as one CSV per metric x model x split and
are aggregated across datasets by ``concatenate_metrics``.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.stats
import sklearn.metrics

from experiments.data import ExperimentData
from experiments.utils import create_directory
from projected_langevin_sampling_tpu.models.conformalise.base import (
    ConformalPrediction,
    ConformaliseBase,
)
from projected_langevin_sampling_tpu.models.distributions import (
    Bernoulli,
    MultivariateNormal,
    Poisson,
    StudentTMarginals,
)
from projected_langevin_sampling_tpu.models.gaussian_process import SVGP, ExactGP
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.temper.base import TemperBase


def _point_estimate(prediction):
    if isinstance(prediction, MultivariateNormal):
        return prediction.mean
    if isinstance(prediction, Bernoulli):
        return prediction.probs
    if isinstance(prediction, Poisson):
        return prediction.rate
    if isinstance(prediction, StudentTMarginals):
        return prediction.loc
    if isinstance(prediction, ConformalPrediction):
        return prediction.mean
    raise ValueError(f"Prediction type {type(prediction)} not supported")


def calculate_mae(prediction, y) -> float:
    return float(jnp.mean(jnp.abs(_point_estimate(prediction) - y)))


def calculate_mse(prediction, y) -> float:
    return float(jnp.mean(jnp.square(_point_estimate(prediction) - y)))


def calculate_acc(probs, y) -> float:
    """Accuracy at the 0.5 threshold (probs.round()) — the single definition
    shared by the step-size-search selection (runners.train_pls_runner) and
    the published metric CSVs (calculate_metrics), so the two cannot drift."""
    return float(
        sklearn.metrics.accuracy_score(np.asarray(y), np.asarray(probs).round())
    )


def calculate_auc(probs, y) -> float:
    return float(sklearn.metrics.roc_auc_score(np.asarray(y), np.asarray(probs)))


def calculate_f1(probs, y) -> float:
    return float(
        sklearn.metrics.f1_score(np.asarray(y), np.asarray(probs).round())
    )


def calculate_nll(prediction, y) -> float:
    """NLL per distribution type (reference ``metrics.py:74-119``).

    Gaussian predictions use the mean marginal NLL (the reference's
    ``gpytorch.metrics.mean_standardized_log_loss`` is the same quantity);
    conformal predictions are scored as a Gaussian whose std is half the 2/3
    coverage interval width.
    """
    if isinstance(prediction, (MultivariateNormal, Bernoulli, Poisson, StudentTMarginals)):
        return float(prediction.negative_log_likelihood(y))
    if isinstance(prediction, ConformalPrediction):
        assert prediction.coverage == 2 / 3, (
            f"NLL calculation needs 2/3 coverage, got {prediction.coverage=}"
        )
        std = (np.asarray(prediction.upper) - np.asarray(prediction.lower)) / 2
        return float(
            np.mean(
                -scipy.stats.norm.logpdf(
                    np.asarray(y), loc=np.asarray(prediction.mean), scale=std
                )
            )
        )
    raise ValueError(f"Prediction type {type(prediction)} not supported")


def calculate_coverage(prediction: ConformalPrediction, y) -> float:
    y = np.asarray(y)
    return float(
        np.mean(
            (np.asarray(prediction.lower) <= y) & (y <= np.asarray(prediction.upper))
        )
    )


def calculate_average_interval_width(model: ConformaliseBase, x, coverage: float) -> float:
    return model.calculate_average_interval_width(x=x, coverage=coverage)


def calculate_median_interval_width(model: ConformaliseBase, x, coverage: float) -> float:
    lower, upper = model.predict_coverage(x=x, coverage=coverage)
    return float(jnp.median(upper - lower))


def _write(value: float, results_path: str, model_name: str, dataset_name: str, fname: str):
    pd.DataFrame([[value]], columns=[model_name], index=[dataset_name]).to_csv(
        os.path.join(results_path, model_name, fname), index_label="dataset"
    )


def calculate_metrics(
    model,
    experiment_data: ExperimentData,
    model_name: str,
    dataset_name: str,
    results_path: str,
    plots_path: str,
    coverage: float,
    particles=None,
) -> None:
    """Evaluate a model on train+test splits, writing one CSV per metric
    (reference ``metrics.py:149-321``)."""
    from experiments.plotters import plot_true_versus_predicted

    assert experiment_data.train is not None and experiment_data.test is not None
    create_directory(os.path.join(results_path, model_name))
    for data in [experiment_data.train, experiment_data.test]:
        if isinstance(model, (SVGP, ExactGP)):
            prediction = model.predict_y(data.x)
        elif isinstance(model, ConformaliseBase):
            prediction = model(x=data.x, coverage=coverage)
        elif isinstance(model, TemperBase):
            prediction = model(x=data.x)
        elif isinstance(model, PLS) and particles is not None:
            prediction = model(x=data.x, particles=particles, key=0)
        else:
            raise ValueError(f"Model type {type(model)} not supported")

        mae = calculate_mae(prediction=prediction, y=data.y)
        _write(mae, results_path, model_name, dataset_name, f"mae_{data.name}.csv")
        mse = calculate_mse(prediction=prediction, y=data.y)
        _write(mse, results_path, model_name, dataset_name, f"mse_{data.name}.csv")

        if isinstance(prediction, ConformalPrediction):
            _write(
                calculate_coverage(prediction=prediction, y=data.y),
                results_path, model_name, dataset_name, f"coverage_{data.name}.csv",
            )

        if isinstance(model, ConformaliseBase):
            nll = calculate_nll(prediction=model(x=data.x, coverage=2 / 3), y=data.y)
        else:
            nll = calculate_nll(prediction=prediction, y=data.y)
        _write(nll, results_path, model_name, dataset_name, f"nll_{data.name}.csv")

        if isinstance(prediction, Bernoulli):
            _write(
                calculate_acc(prediction.probs, data.y),
                results_path, model_name, dataset_name, f"acc_{data.name}.csv",
            )
            _write(
                calculate_auc(prediction.probs, data.y),
                results_path, model_name, dataset_name, f"auc_{data.name}.csv",
            )
            _write(
                calculate_f1(prediction.probs, data.y),
                results_path, model_name, dataset_name, f"f1_{data.name}.csv",
            )

        if isinstance(model, ConformaliseBase):
            _write(
                calculate_median_interval_width(model=model, x=data.x, coverage=coverage),
                results_path, model_name, dataset_name,
                f"median_interval_width_{data.name}.csv",
            )
            _write(
                calculate_average_interval_width(model=model, x=data.x, coverage=coverage),
                results_path, model_name, dataset_name,
                f"average_interval_width_{data.name}.csv",
            )

        create_directory(os.path.join(plots_path, model_name))
        plot_true_versus_predicted(
            y_true=data.y,
            y_pred=prediction,
            title=(
                f"True versus Predicted ({mae=:.2f},{mse=:.2f},{nll=:.2f}) "
                f"({dataset_name},{model_name},{data.name} data)"
            ),
            save_path=os.path.join(
                plots_path, model_name, f"true_versus_predicted_{data.name}.png"
            ),
            coverage=coverage,
            error_bar=isinstance(prediction, (ConformalPrediction, MultivariateNormal)),
        )


def concatenate_metrics(
    results_path: str,
    data_types: list[str],
    model_names: list[str],
    datasets: list[str],
    metrics: list[str],
) -> None:
    """Aggregate per-dataset CSVs into one table per metric x split
    (reference ``metrics.py:324-362``)."""
    for data_type in data_types:
        for metric in metrics:
            df_list = []
            for dataset in datasets:
                try:
                    df_list.append(
                        pd.concat(
                            [
                                pd.read_csv(
                                    os.path.join(
                                        results_path, dataset, model,
                                        f"{metric}_{data_type}.csv",
                                    ),
                                    index_col="dataset",
                                )
                                for model in model_names
                            ],
                            axis=1,
                        )
                    )
                except Exception as e:
                    print(e)
                    print(f"Dataset {dataset} failed to load results.")
            if df_list:
                pd.concat(df_list, axis=0).to_csv(
                    os.path.join(results_path, f"{metric}_{data_type}.csv"),
                    index_label="dataset",
                )
