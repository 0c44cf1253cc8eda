"""1-D curve regression experiments (reference
``experiments/curves/regression/main.py``): for each synthetic curve —
subsample-GP kernel learning -> greedy inducing points -> PLS (ONB, Gaussian
cost) with step-size search -> conformal calibration -> SVGP baseline on the
PLS kernel. Same config schema and output layout as the reference.
"""

from __future__ import annotations

import argparse
import math
import os

import jax.numpy as jnp
import yaml
from sklearn.model_selection import train_test_split

from experiments.constructors import (
    construct_average_ard_kernel,
    construct_average_gaussian_likelihood_from_models,
    construct_average_mean_constant,
)
from experiments.curves.curves import CURVE_FUNCTIONS, Curve
from experiments.data import Data, ExperimentData, ProblemType
from experiments.loaders import load_pls, load_svgp, save_pls, save_svgp
from experiments.plotters import (
    plot_1d_experiment_data,
    plot_1d_gp_prediction_and_inducing_points,
    plot_1d_pls_prediction,
    plot_eigenvalues,
)
from experiments.preprocess import split_regression_data_intervals
from experiments.runners import (
    animate_pls_1d_particles_runner,
    exact_gp_runner,
    inducing_points_runner,
    plot_pls_1d_particles_runner,
    train_pls_runner,
    train_svgp_runner,
)
from experiments.utils import create_directory, str2bool
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.conformalise import (
    ConformaliseGP,
    ConformalisePLS,
)
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.gaussian_process import GaussianLikelihood
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

parser = argparse.ArgumentParser(description="Main script for toy regression experiments.")
parser.add_argument("--config_path", type=str, help="Path to the configuration file.")
parser.add_argument(
    "--include_gif", type=str2bool, default=False,
    help="Indicate whether to include GIFs in the output.",
)
parser.add_argument(
    "--curve", type=int, default=None,
    help="Run only the given curve index (1-based); default all.",
)
parser.add_argument(
    "--outputs_dirname", type=str, required=False, default="outputs",
    help="outputs subdirectory (use a distinct one for non-default configs)",
)


def get_experiment_data(
    curve_function: Curve,
    number_of_data_points: int,
    seed: int,
    sigma_true: float,
    number_of_test_intervals: int,
    total_number_of_intervals: int,
    validation_data_percentage: float,
    min_validation_data_points: int = 50,
) -> ExperimentData:
    import numpy as np

    x = jnp.linspace(-3, 3, number_of_data_points).reshape(-1, 1)
    y = curve_function.regression(x=x, sigma_true=sigma_true, key=seed)
    (x_tv, y_tv, _, x_test, y_test, _) = split_regression_data_intervals(
        split_seed=curve_function.seed,
        x=x,
        y=y,
        number_of_test_intervals=number_of_test_intervals,
        total_number_of_intervals=total_number_of_intervals,
    )
    if len(x_tv) < min_validation_data_points:
        raise ValueError(
            f"Number of training points is less than the minimum number of "
            f"validation points: {len(x_tv)} < {min_validation_data_points}"
        )
    x_train, x_validation, y_train, y_validation = train_test_split(
        np.asarray(x_tv), np.asarray(y_tv),
        test_size=max(
            validation_data_percentage, min_validation_data_points / len(x_tv)
        ),
        random_state=seed,
    )
    return ExperimentData(
        name=type(curve_function).__name__.lower(),
        problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=jnp.asarray(x_train), y=jnp.asarray(y_train), name="train"),
        validation=Data(
            x=jnp.asarray(x_validation), y=jnp.asarray(y_validation), name="validation"
        ),
        test=Data(x=jnp.asarray(x_test), y=jnp.asarray(y_test), name="test"),
    )


def main(
    curve_function: Curve,
    data_config: dict,
    kernel_config: dict,
    inducing_points_config: dict,
    pls_config: dict,
    svgp_config: dict,
    outputs_path: str,
    include_gif: bool,
) -> None:
    experiment_data = get_experiment_data(
        curve_function=curve_function,
        number_of_data_points=data_config["number_of_data_points"],
        seed=data_config["seed"],
        sigma_true=data_config["sigma_true"],
        number_of_test_intervals=data_config["number_of_test_intervals"],
        total_number_of_intervals=data_config["total_number_of_intervals"],
        validation_data_percentage=data_config["validation_data_percentage"],
    )
    curve_name = type(curve_function).__name__.lower()
    data_path = os.path.join(outputs_path, "data", curve_name)
    plot_curve_path = os.path.join(outputs_path, "plots", curve_name)
    models_path = os.path.join(outputs_path, "models", curve_name)
    create_directory(plot_curve_path)
    plot_1d_experiment_data(
        experiment_data=experiment_data,
        title=f"{curve_function.__name__} data",
        save_path=os.path.join(plot_curve_path, "experiment-data.png"),
    )

    # 1. kernel hyperparameters from subsample exact-GP fits
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
        model_path=os.path.join(models_path, "subsample_gp"),
        data_path=os.path.join(data_path, "subsample_gp"),
        plot_loss_path=plot_curve_path,
    )
    average_ard_kernel = construct_average_ard_kernel(
        kernels=[model.kernel for model in subsample_gp_models]
    )
    likelihood = construct_average_gaussian_likelihood_from_models(subsample_gp_models)
    mean_constant = construct_average_mean_constant(subsample_gp_models)

    # 2. greedy inducing points, M = factor * N^(1/power)
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

    # 3. PLS: ONB basis + Gaussian cost
    pls_kernel = PLSKernel(
        base_kernel=average_ard_kernel, approximation_samples=inducing_points.x
    )
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
        # opt-in (pls: mean_constant: gp): the learned GP mean constant the
        # harness already hands SVGP (reference gives it to SVGP only)
        mean_constant=(
            float(mean_constant)
            if pls_config.get("mean_constant") == "gp"
            else 0.0
        ),
    )
    plot_eigenvalues(
        onb_basis,
        title=f"Eigenvalue spectrum ({curve_name})",
        save_path=os.path.join(plot_curve_path, "eigenvalues.png"),
    )
    cost = GaussianCost(
        observation_noise=likelihood.noise,
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
    )
    plot_title = "PLS for Regression"
    pls = PLS(basis=onb_basis, cost=cost, name="pls-onb")
    pls_path = os.path.join(models_path, f"{pls.name}.pkl")
    particles = pls.initialise_particles(
        number_of_particles=pls_config["number_of_particles"],
        noise_only=pls_config["initial_particles_noise_only"],
        seed=pls_config["seed"],
    )
    plot_pls_1d_particles_runner(
        pls=pls,
        particles=particles,
        particle_name=f"{pls.name}-initial",
        experiment_data=experiment_data,
        plot_particles_path=plot_curve_path,
        plot_title=plot_title,
    )
    if os.path.exists(pls_path):
        particles, _, best_lr, number_of_epochs = load_pls(pls_path, pls=pls)
    else:
        create_directory(models_path)
        particles, best_lr, number_of_epochs = train_pls_runner(
            pls=pls,
            particles=particles,
            particle_name=pls.name,
            experiment_data=experiment_data,
            simulation_duration=pls_config["simulation_duration"],
            step_size_upper=pls_config["step_size_upper"],
            number_of_step_searches=pls_config["number_of_step_searches"],
            maximum_number_of_steps=int(pls_config["maximum_number_of_steps"]),
            minimum_change_in_energy_potential=pls_config[
                "minimum_change_in_energy_potential"
            ],
            seed=pls_config["seed"],
            plot_title=plot_title,
            plot_energy_potential_path=plot_curve_path,
            metric_to_optimise=pls_config["metric_to_optimise"],
            early_stopper_patience=pls_config["early_stopper_patience"],
            fast_path=pls_config.get("fast_path", "auto"),
            discretisation=pls_config.get("discretisation", "euler"),
            parallel=pls_config.get("parallel"),
        )
        save_pls(
            pls_path,
            particles=particles,
            observation_noise=pls.observation_noise,
            best_lr=best_lr,
            number_of_epochs=number_of_epochs,
            basis=pls.basis,
        )
    pls_conformalised = ConformalisePLS(
        x_calibration=experiment_data.validation.x,
        y_calibration=experiment_data.validation.y,
        pls=pls,
        particles=particles,
    )
    plot_pls_1d_particles_runner(
        pls=pls,
        particles=particles,
        particle_name=f"{pls.name}-learned",
        experiment_data=experiment_data,
        plot_particles_path=plot_curve_path,
        plot_title=plot_title,
        christmas_colours=pls_config.get("christmas_colours", False),
    )
    plot_pls_1d_particles_runner(
        pls=pls_conformalised,
        particles=particles,
        particle_name=f"{pls.name}-learned-conformalised",
        experiment_data=experiment_data,
        plot_particles_path=plot_curve_path,
        plot_title=f"{plot_title} Conformalised",
    )
    if include_gif and best_lr is not None:
        animate_pls_1d_particles_runner(
            pls=pls,
            particles=pls.initialise_particles(
                number_of_particles=pls_config["number_of_particles"],
                noise_only=pls_config["initial_particles_noise_only"],
                seed=pls_config["seed"],
            ),
            particle_name=pls.name,
            experiment_data=experiment_data,
            animate_1d_path=plot_curve_path,
            step_size=best_lr,
            number_of_epochs=number_of_epochs,
            seed=pls_config["seed"],
            christmas_colours=pls_config.get("christmas_colours", False),
        )

    # 4. SVGP baseline on the PLS kernel (the Titsias-equivalence config)
    plot_title = "SVGP for Regression"
    model_name = "svgp-r"
    svgp_model_path = os.path.join(models_path, f"{model_name}.pkl")
    gaussian_likelihood = GaussianLikelihood(noise=likelihood.noise)
    if os.path.exists(svgp_model_path):
        svgp, losses, best_learning_rate = load_svgp(
            svgp_model_path, likelihood=gaussian_likelihood
        )
    else:
        svgp, losses, best_learning_rate = train_svgp_runner(
            model_name=model_name,
            experiment_data=experiment_data,
            inducing_points=inducing_points,
            kernel=pls_kernel,
            likelihood=gaussian_likelihood,
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
            plot_title=plot_title,
            plot_loss_path=plot_curve_path,
        )
        if svgp is not None:
            save_svgp(svgp_model_path, svgp, losses, best_learning_rate)
    if svgp is not None:
        svgp_conformalised = ConformaliseGP(
            x_calibration=experiment_data.validation.x,
            y_calibration=experiment_data.validation.y,
            gp=svgp,
        )
        plot_1d_pls_prediction(
            experiment_data=experiment_data,
            x=experiment_data.full.x,
            predicted_distribution=svgp_conformalised.predict(
                experiment_data.full.x, coverage=0.95
            ),
            title=f"{plot_title} Conformalised",
            save_path=os.path.join(plot_curve_path, f"{model_name}-conformalised.png"),
        )
        plot_1d_gp_prediction_and_inducing_points(
            model=svgp,
            experiment_data=experiment_data,
            inducing_points=inducing_points,
            title=plot_title,
            save_path=os.path.join(plot_curve_path, f"{model_name}.png"),
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
    curves = CURVE_FUNCTIONS
    if args.curve is not None:
        curves = [CURVE_FUNCTIONS[args.curve - 1]]
    for curve_function_ in curves:
        main(
            curve_function=curve_function_,
            data_config=loaded_config["data"],
            kernel_config=loaded_config["kernel"],
            inducing_points_config=loaded_config["inducing_points"],
            pls_config=loaded_config["pls"],
            svgp_config=loaded_config["svgp"],
            outputs_path=outputs_path,
            include_gif=args.include_gif,
        )
