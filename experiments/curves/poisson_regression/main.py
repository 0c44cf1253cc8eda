"""1-D Poisson regression experiments (reference
``experiments/curves/poisson_regression/main.py``): ONB+IPB bases with the
Poisson cost and f^2 (square) link — bimodal posteriors by construction
(f and -f both explain the rate).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import yaml

from experiments.curves.common import (
    learn_kernel_and_inducing_points,
    train_or_load_pls,
)
from experiments.curves.curves import CURVE_FUNCTIONS, Curve
from experiments.data import Data, ExperimentData, ProblemType
from experiments.metrics import calculate_metrics
from experiments.plotters import plot_1d_experiment_data, plot_eigenvalues
from experiments.preprocess import split_regression_data_intervals
from experiments.utils import create_directory, str2bool
from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import PoissonCost
from projected_langevin_sampling_tpu.models.link_functions import SquareLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS

parser = argparse.ArgumentParser(description="Main script for toy Poisson regression experiments.")
parser.add_argument("--config_path", type=str)
parser.add_argument("--include_gif", type=str2bool, default=False)
parser.add_argument("--curve", type=int, default=None)


def get_experiment_data(
    curve_function: Curve,
    number_of_data_points: int,
    seed: int,
    number_of_test_intervals: int,
    total_number_of_intervals: int,
) -> ExperimentData:
    x = jnp.linspace(-3, 3, number_of_data_points).reshape(-1, 1)
    y_curve = 2 * curve_function.calculate_curve(x=x).reshape(-1)
    link = SquareLinkFunction()
    rate = link(y_curve)
    y = jax.random.poisson(jax.random.key(seed), rate).astype(jnp.float64)
    (x_train, y_train, y_train_u, x_test, y_test, y_test_u) = (
        split_regression_data_intervals(
            split_seed=curve_function.seed,
            x=x,
            y=y,
            y_untransformed=rate,
            number_of_test_intervals=number_of_test_intervals,
            total_number_of_intervals=total_number_of_intervals,
        )
    )
    return ExperimentData(
        name=type(curve_function).__name__.lower(),
        problem_type=ProblemType.POISSON_REGRESSION,
        full=Data(x=x, y=y, y_untransformed=rate, name="full"),
        train=Data(x=x_train, y=y_train, y_untransformed=y_train_u, name="train"),
        test=Data(x=x_test, y=y_test, y_untransformed=y_test_u, name="test"),
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
        number_of_test_intervals=data_config["number_of_test_intervals"],
        total_number_of_intervals=data_config["total_number_of_intervals"],
    )
    curve_name = type(curve_function).__name__.lower()
    data_path = os.path.join(outputs_path, "data", curve_name)
    plot_curve_path = os.path.join(outputs_path, "plots", curve_name)
    models_path = os.path.join(outputs_path, "models", curve_name)
    results_path = os.path.join(outputs_path, "results", curve_name)
    create_directory(plot_curve_path)
    plot_1d_experiment_data(
        experiment_data=experiment_data,
        title=f"{curve_function.__name__} Poisson data",
        save_path=os.path.join(plot_curve_path, "experiment-data.png"),
    )

    (_, ard_kernel, _, _, inducing_points, pls_kernel) = (
        learn_kernel_and_inducing_points(
            experiment_data=experiment_data,
            kernel_config=kernel_config,
            inducing_points_config=inducing_points_config,
            models_path=models_path,
            data_path=data_path,
            plot_curve_path=plot_curve_path,
        )
    )
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
    )
    ipb_basis = build_inducing_point_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        y_induce=inducing_points.y,
        x_train=experiment_data.train.x,
    )
    plot_eigenvalues(
        onb_basis, title="Eigenvalues",
        save_path=os.path.join(plot_curve_path, "eigenvalues.png"),
    )
    cost = PoissonCost(
        y_train=experiment_data.train.y, link_function=SquareLinkFunction()
    )
    pls_dict = {
        "pls-onb": PLS(basis=onb_basis, cost=cost),
        "pls-ipb": PLS(basis=ipb_basis, cost=cost),
    }
    plot_title = "PLS for Poisson Regression"
    for pls_name, pls in pls_dict.items():
        particles, best_lr, number_of_epochs = train_or_load_pls(
            pls=pls,
            pls_name=pls_name,
            experiment_data=experiment_data,
            pls_config=pls_config,
            models_path=models_path,
            plot_curve_path=plot_curve_path,
            plot_title=plot_title,
        )
        calculate_metrics(
            model=pls,
            experiment_data=experiment_data,
            model_name=pls_name,
            dataset_name=curve_name,
            results_path=results_path,
            plots_path=plot_curve_path,
            coverage=0.95,
            particles=particles,
        )
        if include_gif and best_lr is not None:
            # reference poisson main's gif branch (transformed + untransformed)
            from experiments.runners import animate_pls_1d_particles_runner

            animate_pls_1d_particles_runner(
                pls=pls,
                particles=pls.initialise_particles(
                    number_of_particles=pls_config["number_of_particles"],
                    noise_only=pls_config["initial_particles_noise_only"],
                    seed=pls_config["seed"],
                ),
                particle_name=pls_name,
                experiment_data=experiment_data,
                animate_1d_path=plot_curve_path,
                step_size=best_lr,
                number_of_epochs=number_of_epochs,
                seed=pls_config["seed"],
                christmas_colours=pls_config.get("christmas_colours", False),
                animate_1d_untransformed_path=plot_curve_path,
            )


if __name__ == "__main__":
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
    outputs_path = os.path.join(os.path.dirname(os.path.realpath(__file__)), "outputs")
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
