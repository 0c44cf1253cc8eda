"""Bimodal mixture-likelihood experiments (reference
``experiments/curves/mixture_likelihood/main.py``): data from a two-mode
shifted-Gaussian likelihood, PLS with the MultiModal cost (autograd-only
gradient) and the custom bimodal particle initialisation
(``main.py:135-163`` generate_init_particles).
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import yaml

from experiments.curves.common import (
    learn_kernel_and_inducing_points,
    train_or_load_pls,
)
from experiments.curves.curves import CURVE_FUNCTIONS, Curve
from experiments.data import ProblemType
from experiments.plotters import plot_1d_experiment_data, plot_eigenvalues
from experiments.preprocess import set_up_experiment
from experiments.utils import create_directory, str2bool
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import MultiModalCost
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS

parser = argparse.ArgumentParser(description="Main script for mixture likelihood experiments.")
parser.add_argument("--config_path", type=str)
parser.add_argument("--include_gif", type=str2bool, default=False)
parser.add_argument("--curve", type=int, default=None)
parser.add_argument(
    "--outputs_dirname",
    type=str,
    default="outputs",
    help="Output directory name (variant runs, e.g. the preconditioned protocol).",
)


def get_experiment_data(
    curve_function: Curve,
    number_of_data_points: int,
    seed: int,
    bernoulli_probability_true: float,
    bernoulli_shift_true: float,
    sigma_true: float,
    train_data_percentage: float,
    validation_data_percentage: float,
):
    """Curve + Gaussian noise; the underlying function has a Bernoulli shift
    baked into y_untransformed (``main.py:47-87``)."""
    x = jnp.linspace(-3, 3, number_of_data_points).reshape(-1, 1)
    y_curve = 2 * curve_function.calculate_curve(x=x).reshape(-1)
    bern_key = jax.random.key(curve_function.seed)
    bernoulli_noise = jax.random.bernoulli(
        bern_key, bernoulli_probability_true
    ).astype(y_curve.dtype)
    gaussian_noise = jax.random.normal(jax.random.key(seed), y_curve.shape, y_curve.dtype)
    y = y_curve + sigma_true * gaussian_noise
    experiment_data = set_up_experiment(
        name=curve_function.__name__,
        problem_type=ProblemType.MULTIMODAL_REGRESSION,
        seed=seed,
        x=x,
        y=y,
        train_data_percentage=train_data_percentage,
        validation_data_percentage=validation_data_percentage,
        normalise=False,
    )
    experiment_data.full.y_untransformed = y_curve + bernoulli_shift_true * bernoulli_noise
    return experiment_data


def generate_init_particles(
    initial_particle_noise: float,
    approximation_dimension: int,
    number_of_particles: int,
    initial_particles_lower: float,
    initial_particles_shift_scale: float,
    bernoulli_shift_true: float,
    basis_dimension: int,
    basis_eigenvectors,
    basis_eigenvalues,
    key=0,
):
    """Bimodal particle init spanning a shift range in function space, pushed
    back into eigencoordinates (reference ``main.py:135-163``)."""
    key = jax.random.key(key) if isinstance(key, int) else key
    init = initial_particle_noise * jax.random.normal(
        key, (approximation_dimension, number_of_particles),
        dtype=basis_eigenvalues.dtype,
    )
    init = init + jnp.linspace(
        initial_particles_lower,
        initial_particles_shift_scale * bernoulli_shift_true,
        number_of_particles,
        dtype=basis_eigenvalues.dtype,
    )[None, :]
    return (
        math.sqrt(basis_dimension)
        * basis_eigenvectors.T
        @ (init / jnp.sqrt(basis_eigenvalues)[:, None])
    )


def main(
    curve_function: Curve,
    data_config: dict,
    kernel_config: dict,
    inducing_points_config: dict,
    pls_config: dict,
    outputs_path: str,
    include_gif: bool,
) -> None:
    experiment_data = get_experiment_data(
        curve_function=curve_function,
        number_of_data_points=data_config["number_of_data_points"],
        seed=data_config["seed"],
        bernoulli_probability_true=data_config["bernoulli_probability_true"],
        bernoulli_shift_true=data_config["bernoulli_shift_true"],
        sigma_true=data_config["sigma_true"],
        train_data_percentage=data_config["train_data_percentage"],
        validation_data_percentage=data_config["validation_data_percentage"],
    )
    curve_name = type(curve_function).__name__.lower()
    data_path = os.path.join(outputs_path, "data", curve_name)
    plot_curve_path = os.path.join(outputs_path, "plots", curve_name)
    models_path = os.path.join(outputs_path, "models", curve_name)
    create_directory(plot_curve_path)
    plot_1d_experiment_data(
        experiment_data=experiment_data,
        title=f"{curve_function.__name__} mixture data",
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
    plot_eigenvalues(
        onb_basis, title="Eigenvalues",
        save_path=os.path.join(plot_curve_path, "eigenvalues.png"),
    )
    cost = MultiModalCost(
        observation_noise=jnp.asarray(data_config["sigma_true"]),
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
        shift=data_config["bernoulli_shift_true"],
        bernoulli_noise=data_config["bernoulli_probability_true"],
    )
    pls = PLS(basis=onb_basis, cost=cost, name="pls-onb")
    init_particles = generate_init_particles(
        initial_particle_noise=pls_config["initial_particle_noise"],
        approximation_dimension=onb_basis.approximation_dimension,
        number_of_particles=pls_config["number_of_particles"],
        initial_particles_lower=pls_config["initial_particles_lower"],
        initial_particles_shift_scale=pls_config["initial_particles_shift_scale"],
        bernoulli_shift_true=data_config["bernoulli_shift_true"],
        basis_dimension=onb_basis.x_induce.shape[0],
        basis_eigenvectors=onb_basis.eigenvectors,
        basis_eigenvalues=onb_basis.eigenvalues,
        key=pls_config["seed"],
    )
    train_or_load_pls(
        pls=pls,
        pls_name=pls.name,
        experiment_data=experiment_data,
        pls_config=pls_config,
        models_path=models_path,
        plot_curve_path=plot_curve_path,
        plot_title="PLS for Multi-modal Regression",
        particles=init_particles,
    )
    if include_gif:
        # the reference README's multimodal animation (reference
        # ``main.py:305-335``): a fresh short run from a narrower bimodal
        # init at the dedicated gif step size, snapshots -> GIF
        from experiments.runners import animate_pls_1d_particles_runner

        gif_init = generate_init_particles(
            initial_particle_noise=pls_config["initial_particle_noise"],
            approximation_dimension=onb_basis.approximation_dimension,
            number_of_particles=pls_config["number_of_particles"],
            initial_particles_lower=pls_config["initial_particles_lower"],
            initial_particles_shift_scale=pls_config[
                "gif_initial_particles_shift_scale"
            ],
            bernoulli_shift_true=data_config["bernoulli_shift_true"],
            basis_dimension=onb_basis.x_induce.shape[0],
            basis_eigenvectors=onb_basis.eigenvectors,
            basis_eigenvalues=onb_basis.eigenvalues,
            key=pls_config["seed"],
        )
        animate_pls_1d_particles_runner(
            pls=pls,
            particles=gif_init,
            particle_name=pls.name,
            experiment_data=experiment_data,
            animate_1d_path=plot_curve_path,
            step_size=float(pls_config["gif_lr"]),
            number_of_epochs=int(pls_config["gif_number_of_epochs"]),
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
            outputs_path=outputs_path,
            include_gif=args.include_gif,
        )
