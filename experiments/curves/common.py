"""Shared pipeline pieces for the curve experiment mains: the
kernel-learning -> inducing-point -> PLS-train-or-load sequence that every
reference curve main repeats (``curves/*/main.py``)."""

from __future__ import annotations

import math
import os

import jax.numpy as jnp

from experiments.constructors import (
    construct_average_ard_kernel,
    construct_average_gaussian_likelihood_from_models,
    construct_average_mean_constant,
)
from experiments.data import ExperimentData
from experiments.loaders import load_pls, save_pls
from experiments.runners import (
    dirichlet_exact_gp_runner,
    exact_gp_runner,
    inducing_points_runner,
    plot_pls_1d_particles_runner,
    train_pls_runner,
)
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def learn_kernel_and_inducing_points(
    experiment_data: ExperimentData,
    kernel_config: dict,
    inducing_points_config: dict,
    models_path: str,
    data_path: str,
    plot_curve_path: str,
    regression_targets=None,
    dirichlet_labels: bool = False,
):
    """Subsample exact-GP fits -> averaged ARD kernel (+likelihood, mean) ->
    greedy inducing points with M = factor * N^(1/power).

    ``dirichlet_labels=True``: classification — fit the GPs on
    Dirichlet-transformed logit-scale targets per class (reference
    ``curves/classification/main.py:162-189``)."""
    train = experiment_data.train
    gp_train_data = train
    if regression_targets is not None:
        # poisson/mixture mains learn the kernel on surrogate regression labels
        from experiments.data import Data

        gp_train_data = Data(x=train.x, y=regression_targets, name="train")
        experiment_data = ExperimentData(
            name=experiment_data.name,
            problem_type=experiment_data.problem_type,
            full=experiment_data.full,
            train=gp_train_data,
            test=experiment_data.test,
            validation=experiment_data.validation,
        )
    runner = dirichlet_exact_gp_runner if dirichlet_labels else exact_gp_runner
    subsample_gp_models = runner(
        experiment_data=experiment_data,
        kernel=ARDKernel(
            lengthscales=jnp.ones(train.x.shape[1], dtype=train.x.dtype),
            outputscale=jnp.asarray(1.0, dtype=train.x.dtype),
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
    inducing_points = inducing_points_runner(
        seed=inducing_points_config["seed"],
        inducing_point_selector=ConditionalVarianceInducingPointSelector(),
        data=train,
        number_induce_points=int(
            inducing_points_config["inducing_points_factor"]
            * math.pow(
                train.x.shape[0], 1 / inducing_points_config["inducing_points_power"]
            )
        ),
        kernel=average_ard_kernel,
    )
    pls_kernel = PLSKernel(
        base_kernel=average_ard_kernel, approximation_samples=inducing_points.x
    )
    return subsample_gp_models, average_ard_kernel, likelihood, mean_constant, inducing_points, pls_kernel


def train_or_load_pls(
    pls,
    pls_name: str,
    experiment_data: ExperimentData,
    pls_config: dict,
    models_path: str,
    plot_curve_path: str,
    plot_title: str,
    particles=None,
):
    """Initial plot -> train-or-load -> learned plot; returns
    (particles, best_lr, number_of_epochs)."""
    pls_path = os.path.join(models_path, f"{pls_name}.pkl")
    if particles is None:
        particles = pls.initialise_particles(
            number_of_particles=pls_config["number_of_particles"],
            noise_only=pls_config["initial_particles_noise_only"],
            seed=pls_config["seed"],
        )
    plot_pls_1d_particles_runner(
        pls=pls,
        particles=particles,
        particle_name=f"{pls_name}-initial",
        experiment_data=experiment_data,
        plot_particles_path=plot_curve_path,
        plot_title=plot_title,
    )
    if os.path.exists(pls_path):
        particles, _, best_lr, number_of_epochs = load_pls(pls_path, pls=pls)
    else:
        os.makedirs(models_path, exist_ok=True)
        particles, best_lr, number_of_epochs = train_pls_runner(
            pls=pls,
            particles=particles,
            particle_name=pls_name,
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
    plot_pls_1d_particles_runner(
        pls=pls,
        particles=particles,
        particle_name=f"{pls_name}-learned",
        experiment_data=experiment_data,
        plot_particles_path=plot_curve_path,
        plot_title=plot_title,
    )
    return particles, best_lr, number_of_epochs
