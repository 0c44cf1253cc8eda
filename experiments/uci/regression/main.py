"""UCI regression experiments (reference ``experiments/uci/regression/main.py``):
6 datasets x 12 model variants — {PLS-ONB, PLS-Student-ONB, SVGP,
SVGP-Student} x {raw, temper, conformalise} — across data seeds, with metric
CSVs aggregated by ``concatenate_metrics``. Student-T df/scale are fitted to
the subsample-GP residuals with scipy (reference ``main.py:109-125``).
"""

from __future__ import annotations

import argparse
import math
import os
import pickle
import traceback

import jax.numpy as jnp
import pandas as pd
import scipy.stats
import yaml

from experiments.constructors import (
    construct_average_ard_kernel,
    construct_average_gaussian_likelihood_from_models,
    construct_average_mean_constant,
)
from experiments.data import ExperimentData, ProblemType
from experiments.loaders import load_pls, load_svgp, save_pls, save_svgp
from experiments.metrics import calculate_metrics, concatenate_metrics
from experiments.plotters import plot_eigenvalues
from experiments.preprocess import set_up_experiment
from experiments.runners import (
    exact_gp_runner,
    inducing_points_runner,
    train_pls_runner,
    train_svgp_runner,
)
from experiments.uci.constants import (
    EXTRA_REGRESSION_DATASETS,
    RegressionDatasetSchema,
    resolve_schema,
)
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.basis.noise_distributions import (
    StudentTPredictiveNoise,
)
from projected_langevin_sampling_tpu.models.conformalise import (
    ConformaliseGP,
    ConformalisePLS,
)
from projected_langevin_sampling_tpu.models.costs import GaussianCost, StudentTCost
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.gaussian_process import (
    GaussianLikelihood,
    StudentTLikelihood,
)
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.mean_constant import fit_mean_constant_map
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.temper import TemperGP, TemperPLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

parser = argparse.ArgumentParser(description="Main script for UCI regression data experiments.")
parser.add_argument("--config_path", type=str, required=True)
parser.add_argument("--data_seed", type=int, required=False, default=-1)
parser.add_argument("--dataset", type=str, required=False, default=None)
parser.add_argument(
    "--outputs_dirname", type=str, required=False, default="outputs",
    help="outputs subdirectory (use a distinct one for non-default configs)",
)
parser.add_argument(
    "--models", type=str, required=False, default=None,
    help="comma-separated base model names (pls-onb, pls-student-onb, svgp, "
    "svgp-student) to restrict the run to; for metrics-only recompute passes "
    "over partially-populated output dirs",
)

MODEL_NAMES = [
    "pls-onb",
    "pls-onb-temper",
    "pls-onb-conformalise",
    "pls-student-onb",
    "pls-student-onb-temper",
    "pls-student-onb-conformalise",
    "svgp",
    "svgp-temper",
    "svgp-conformalise",
    "svgp-student",
    "svgp-student-temper",
    "svgp-student-conformalise",
]

METRICS = ["mae", "mse", "nll", "average_interval_width", "coverage"]


def get_experiment_data(
    seed: int,
    train_data_percentage: float,
    validation_data_percentage: float,
    dataset_name: str,
) -> ExperimentData:
    df = pd.read_csv(
        os.path.join("experiments", "uci", "datasets", f"{dataset_name}.csv")
    )
    df.columns = [c.lower().replace(" ", "") for c in df.columns]
    schema = resolve_schema(dataset_name)
    input_columns = [c.lower().replace(" ", "") for c in schema.input_column_names]
    output_column = schema.output_column_name.lower().replace(" ", "")
    x = jnp.asarray(df[input_columns].to_numpy(dtype=float))
    y = jnp.asarray(df[output_column].to_numpy(dtype=float))
    return set_up_experiment(
        name=dataset_name,
        problem_type=ProblemType.REGRESSION,
        seed=seed,
        x=x,
        y=y,
        train_data_percentage=train_data_percentage,
        validation_data_percentage=validation_data_percentage,
        normalise=True,
    )


def estimate_student_parameters(y_actual, predictions) -> tuple[float, float]:
    """Fit Student-T df/scale to the mean subsample-GP residuals
    (reference ``main.py:109-125``)."""
    import numpy as np

    residuals = np.mean(
        np.stack([np.asarray(y_actual) - np.asarray(p.mean) for p in predictions], axis=1),
        axis=1,
    )
    degrees_of_freedom, _, scale = scipy.stats.t.fit(residuals, floc=0)
    # Near-Gaussian residuals drive the MLE df to ~1e13, where the profile
    # likelihood is flat and the fitted value carries only fp noise — which
    # then differs between runs and (as a static pytree field) breaks
    # checkpoint reloads. A t with df 1e6 is Gaussian to ~1e-6; cap there.
    return float(min(degrees_of_freedom, 1e6)), float(scale)


def main(
    data_seed: int,
    dataset_name: str,
    data_config: dict,
    kernel_config: dict,
    inducing_points_config: dict,
    pls_config: dict,
    svgp_config: dict,
    metrics_config: dict,
    outputs_path: str,
    models_filter: set[str] | None = None,
) -> None:
    """``models_filter``: restrict the PLS/SVGP model loop to these base model
    names (e.g. ``{"svgp-student"}``) — used by metrics-only recompute passes
    over partially-populated output dirs, where touching an un-checkpointed
    model would trigger its (multi-hour) step-size search."""
    print(f"Running experiment for {dataset_name=} and {data_seed=}.")
    data_path = os.path.join(outputs_path, str(data_seed), "data", dataset_name)
    plots_path = os.path.join(outputs_path, str(data_seed), "plots", dataset_name)
    results_path = os.path.join(outputs_path, str(data_seed), "results", dataset_name)
    models_path = os.path.join(outputs_path, str(data_seed), "models", dataset_name)
    for p in (data_path, plots_path, results_path, models_path):
        os.makedirs(p, exist_ok=True)

    experiment_data_path = os.path.join(data_path, "experiment_data.pkl")
    inducing_points_path = os.path.join(data_path, "inducing_points.pkl")
    if os.path.exists(experiment_data_path):
        experiment_data = ExperimentData.load(
            path=experiment_data_path, problem_type=ProblemType.REGRESSION
        )
        print(f"Loaded experiment data from {experiment_data_path=}")
    else:
        experiment_data = get_experiment_data(
            seed=data_seed,
            train_data_percentage=data_config["train_data_percentage"],
            validation_data_percentage=data_config["validation_data_percentage"],
            dataset_name=dataset_name,
        )
        experiment_data.save(experiment_data_path)

    subsample_gp_models = exact_gp_runner(
        experiment_data=experiment_data,
        kernel=ARDKernel(
            lengthscales=jnp.ones(experiment_data.train.x.shape[1]),
            outputscale=jnp.asarray(1.0),
        ),
        subsample_size=kernel_config["subsample_size"],
        seed=kernel_config["seed"],
        number_of_epochs=kernel_config["number_of_epochs"],
        learning_rate=kernel_config["learning_rate"],
        number_of_iterations=kernel_config["number_of_iterations"],
        early_stopper_patience=kernel_config["early_stopper_patience"],
        plot_loss_path=plots_path,
        model_path=os.path.join(models_path, "subsample_gp"),
        data_path=os.path.join(data_path, "subsample_gp"),
    )
    average_ard_kernel = construct_average_ard_kernel(
        kernels=[model.kernel for model in subsample_gp_models]
    )
    likelihood = construct_average_gaussian_likelihood_from_models(subsample_gp_models)
    mean_constant = construct_average_mean_constant(subsample_gp_models)
    # opt-in (pls: mean_constant: gp): give PLS the same learned prior mean
    # constant the harness already hands SVGP (the reference gives it to SVGP
    # only — reference main.py passes mean_constant to SVGP, never to PLS)
    pls_mean_constant = (
        float(mean_constant) if pls_config.get("mean_constant") == "gp" else 0.0
    )

    if os.path.exists(inducing_points_path):
        with open(inducing_points_path, "rb") as f:
            inducing_points = pickle.load(f)
    else:
        inducing_points = inducing_points_runner(
            seed=inducing_points_config["seed"],
            inducing_point_selector=ConditionalVarianceInducingPointSelector(),
            data=experiment_data.train,
            number_induce_points=int(
                inducing_points_config["inducing_points_factor"]
                * math.pow(
                    experiment_data.train.x.shape[0],
                    1 / inducing_points_config["inducing_points_power"],
                )
            ),
            kernel=average_ard_kernel,
        )
        with open(inducing_points_path, "wb") as f:
            pickle.dump(inducing_points, f)

    pls_kernel = PLSKernel(
        base_kernel=average_ard_kernel, approximation_samples=inducing_points.x
    )
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
        relative_eigenvalue_threshold=pls_config.get(
            "onb_relative_eigenvalue_threshold"
        ),
        mean_constant=pls_mean_constant,
    )
    gaussian_cost = GaussianCost(
        observation_noise=likelihood.noise,
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
    )
    degrees_of_freedom, scale = estimate_student_parameters(
        y_actual=experiment_data.train.y,
        predictions=[m.predict_y(experiment_data.train.x) for m in subsample_gp_models],
    )
    student_onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
        relative_eigenvalue_threshold=pls_config.get(
            "onb_relative_eigenvalue_threshold"
        ),
        mean_constant=pls_mean_constant,
        # NOTE: likelihood.noise is a VARIANCE handed to a scale parameter —
        # reproduced deliberately from the reference
        # (uci/regression/main.py:235-239 passes likelihood.noise as
        # torch StudentT's scale); "fixing" the units would break parity.
        additional_predictive_noise_distribution=StudentTPredictiveNoise(
            df=degrees_of_freedom, loc=0.0, scale=float(likelihood.noise)
        ),
    )
    student_cost = StudentTCost(
        degrees_of_freedom=degrees_of_freedom,
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
        scale=scale,
    )
    # "map" mode: empirical-Bayes prior-mean constant per cost — the constant
    # maximising the penalised posterior jointly over [m0; U] (the PLS
    # analogue of SVGP's ELBO-trained ConstantMean; on kin8nm the SVGP
    # constant alone is worth 9x predictive MSE under the r-kernel prior,
    # see models/mean_constant.py)
    if pls_config.get("mean_constant") == "map":
        # Only fit for models that will actually train: on the load path
        # load_pls restores the checkpointed mean constant and the Newton
        # fit would be discarded (matters for metrics-only / gap-fill reruns).
        if not os.path.exists(os.path.join(models_path, "pls-onb.pkl")):
            m0_gaussian = fit_mean_constant_map(basis=onb_basis, cost=gaussian_cost)
            onb_basis = onb_basis.replace(mean_constant=m0_gaussian)
            print(f"  [mean-constant map] gaussian m0={m0_gaussian:.4f}", flush=True)
        if not os.path.exists(os.path.join(models_path, "pls-student-onb.pkl")):
            m0_student = fit_mean_constant_map(
                basis=student_onb_basis, cost=student_cost
            )
            student_onb_basis = student_onb_basis.replace(mean_constant=m0_student)
            print(f"  [mean-constant map] student m0={m0_student:.4f}", flush=True)
    pls_dict = {
        "pls-onb": PLS(basis=onb_basis, cost=gaussian_cost),
        "pls-student-onb": PLS(basis=student_onb_basis, cost=student_cost),
    }
    for pls_name, pls in pls_dict.items():
        if models_filter is not None and pls_name not in models_filter:
            continue
        plot_eigenvalues(
            basis=pls.basis,
            save_path=os.path.join(plots_path, f"eigenvalues-{pls_name}.png"),
            title=f"Eigenvalues ({dataset_name})",
        )
        pls_path = os.path.join(models_path, f"{pls_name}.pkl")
        if os.path.exists(pls_path):
            particles, _, _, _ = load_pls(pls_path, pls=pls)
        else:
            particles = pls.initialise_particles(
                number_of_particles=pls_config["number_of_particles"],
                noise_only=pls_config["initial_particles_noise_only"],
                seed=pls_config["seed"],
            )
            particles, best_lr, number_of_epochs = train_pls_runner(
                pls=pls,
                particles=particles,
                particle_name=pls_name,
                experiment_data=experiment_data,
                simulation_duration=pls_config["simulation_duration"],
                maximum_number_of_steps=int(pls_config["maximum_number_of_steps"]),
                step_size_upper=pls_config["step_size_upper"],
                number_of_step_searches=pls_config["number_of_step_searches"],
                minimum_change_in_energy_potential=pls_config[
                    "minimum_change_in_energy_potential"
                ],
                seed=pls_config["seed"],
                plot_title=f"{dataset_name}",
                plot_energy_potential_path=plots_path,
                metric_to_optimise=pls_config["metric_to_optimise"],
                early_stopper_patience=pls_config["early_stopper_patience"],
                fast_path=pls_config.get("fast_path", "auto"),
                discretisation=pls_config.get("discretisation", "euler"),
                parallel=pls_config.get("parallel"),
                equilibrate_spread=pls_config.get("equilibrate_spread"),
            )
            save_pls(
                pls_path,
                particles=particles,
                observation_noise=pls.observation_noise,
                best_lr=best_lr,
                number_of_epochs=number_of_epochs,
                # always record the trained-under constant (an exact 0.0 is a
                # valid value — `or None` would collapse it and skip the
                # restore on reload)
                mean_constant=float(pls.basis.mean_constant),
                basis=pls.basis,
            )
        calculate_metrics(
            model=pls,
            particles=particles,
            model_name=pls_name,
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )
        calculate_metrics(
            model=TemperPLS(
                pls=pls,
                particles=particles,
                x_calibration=experiment_data.validation.x,
                y_calibration=experiment_data.validation.y,
                # debug (skip the Gaussian-cost asserts) keyed on the actual
                # cost type, not the model name
                debug=not isinstance(pls.cost, GaussianCost),
            ),
            particles=particles,
            model_name=f"{pls_name}-temper",
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )
        calculate_metrics(
            model=ConformalisePLS(
                pls=pls,
                particles=particles,
                x_calibration=experiment_data.validation.x,
                y_calibration=experiment_data.validation.y,
            ),
            particles=particles,
            model_name=f"{pls_name}-conformalise",
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )

    # SVGP baselines x {Gaussian, Student-T} likelihoods
    svgp_variants = {
        "svgp": GaussianLikelihood(noise=likelihood.noise),
        "svgp-student": StudentTLikelihood(
            noise=likelihood.noise, degrees_of_freedom=degrees_of_freedom
        ),
    }
    for model_name, svgp_likelihood in svgp_variants.items():
        if models_filter is not None and model_name not in models_filter:
            continue
        svgp_path = os.path.join(models_path, f"{model_name}.pkl")
        if os.path.exists(svgp_path):
            svgp, _, _ = load_svgp(svgp_path, likelihood=svgp_likelihood)
        else:
            svgp, losses, best_learning_rate = train_svgp_runner(
                model_name=model_name,
                experiment_data=experiment_data,
                inducing_points=inducing_points,
                kernel=pls_kernel,
                likelihood=svgp_likelihood,
                seed=svgp_config["seed"],
                number_of_epochs=svgp_config["number_of_epochs"],
                batch_size=svgp_config["batch_size"],
                learning_rate_upper=svgp_config["learning_rate_upper"],
                learning_rate_lower=svgp_config["learning_rate_lower"],
                number_of_learning_rate_searches=svgp_config[
                    "number_of_learning_rate_searches"
                ],
                is_fixed=True,
                observation_noise=float(likelihood.noise),
                mean_constant=float(mean_constant),
                early_stopper_patience=svgp_config["early_stopper_patience"],
                models_path=os.path.join(models_path, f"{model_name}-kernel-iterations"),
                plot_title=f"SVGP ({dataset_name})",
                plot_loss_path=plots_path,
            )
            if svgp is None:
                print(f"SVGP training failed for {model_name=} on {dataset_name=}")
                continue
            save_svgp(svgp_path, svgp, losses, best_learning_rate)
        calculate_metrics(
            model=svgp,
            model_name=model_name,
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )
        calculate_metrics(
            model=TemperGP(
                gp=svgp,
                x_calibration=experiment_data.validation.x,
                y_calibration=experiment_data.validation.y,
            ),
            model_name=f"{model_name}-temper",
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )
        calculate_metrics(
            model=ConformaliseGP(
                gp=svgp,
                x_calibration=experiment_data.validation.x,
                y_calibration=experiment_data.validation.y,
            ),
            model_name=f"{model_name}-conformalise",
            dataset_name=dataset_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=metrics_config["coverage"],
        )


if __name__ == "__main__":
    import jax

    if os.environ.get("PLST_X64", "1") != "0":
        # the reference runs float64; set PLST_X64=0 for fp32 (TPU production)
        jax.config.update("jax_enable_x64", True)
    platform = os.environ.get("PLST_PLATFORM")
    if platform is None and jax.config.jax_enable_x64:
        # fp64 belongs on the host CPU (TPU fp64 is emulated and the device
        # eigh is reduced-precision); fp32 production runs use the TPU.
        # NOTE: set via jax.config, not JAX_PLATFORMS — a registered hardware
        # plugin wins over the env var.
        platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)
    args = parser.parse_args()
    with open(args.config_path) as file:
        loaded_config = yaml.safe_load(file)
    outputs_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), args.outputs_dirname
    )
    data_seeds = [args.data_seed] if args.data_seed >= 0 else list(range(10))
    # --dataset also accepts the extra offline real datasets
    # (constants.EXTRA_REGRESSION_DATASETS); the full sweep stays the
    # reference's 6-dataset list
    if args.dataset and args.dataset in EXTRA_REGRESSION_DATASETS:
        dataset_names = [args.dataset]
    elif args.dataset:
        dataset_names = [RegressionDatasetSchema(args.dataset).value]
    else:
        dataset_names = [d.value for d in RegressionDatasetSchema]
    for seed in data_seeds:
        for dataset_name in dataset_names:
            try:
                main(
                    data_seed=seed,
                    dataset_name=dataset_name,
                    data_config=loaded_config["data"],
                    kernel_config=loaded_config["kernel"],
                    inducing_points_config=loaded_config["inducing_points"],
                    pls_config=loaded_config["pls"],
                    svgp_config=loaded_config["svgp"],
                    metrics_config=loaded_config["metrics"],
                    outputs_path=outputs_path,
                    models_filter=(
                        set(args.models.split(",")) if args.models else None
                    ),
                )
            except Exception as e:
                # full traceback: a swallowed config typo otherwise turns a
                # multi-hour sweep into an exit-0 run with empty outputs
                print(f"Dataset {dataset_name} failed: {e}")
                print(traceback.format_exc())
        # concatenate over every dataset with results on disk, not just this
        # invocation's list — a single-dataset gap-fill run must not clobber
        # the seed's aggregate CSVs with a one-dataset table
        results_root = os.path.join(outputs_path, str(seed), "results")
        present = (
            [
                d
                for d in os.listdir(results_root)
                if os.path.isdir(os.path.join(results_root, d))
            ]
            if os.path.isdir(results_root)
            else []
        )
        concatenate_metrics(
            results_path=results_root,
            data_types=["train", "test"],
            model_names=MODEL_NAMES,
            datasets=sorted(set(dataset_names) | set(present)),
            metrics=METRICS,
        )
