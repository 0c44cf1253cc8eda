"""Compare ONB eigenvector scalings — reference vs consistent-KKL ("nystrom")
— on the 10 synthetic 1-D curves, against the SVGP baseline.

Companion experiment to DESIGN.md "ONB prior scaling": the reference's
V/sqrt(M_k*lambda) scaling implies a function-space prior of
r(x,x) = (1/M) k(x,Z)k(Z,x), which over-shrinks the posterior mean on smooth
kernels; scaling="nystrom" (V/(sqrt(M)*lambda)) implies the Nystrom prior
Qff ~= k(x,x) and recovers the Titsias-optimal mean for Gaussian costs.

Runs the standard curve-regression pipeline (subsample-GP kernel learning,
conditional-variance inducing points, log-spaced step-size search) ONCE per
curve, sharing the learned kernel/inducing points between the two scalings so
the comparison isolates the scaling alone. CPU/fp64 by default (PLST_X64=1);
writes results/onb_scaling_comparison.md.

Usage: PYTHONPATH=.:/root/.axon_site python experiments/compare_onb_scaling.py
"""

from __future__ import annotations

import math
import os
import tempfile

import jax.numpy as jnp
import yaml

from experiments.constructors import (
    construct_average_ard_kernel,
    construct_average_gaussian_likelihood_from_models,
)
from experiments.curves.curves import CURVE_FUNCTIONS
from experiments.curves.regression.main import get_experiment_data
from experiments.metrics import calculate_mse, calculate_nll
from experiments.runners import (
    exact_gp_runner,
    inducing_points_runner,
    train_pls_runner,
    train_svgp_runner,
)
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.gaussian_process import GaussianLikelihood
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def run_curve(curve_function, cfg, workdir: str) -> dict:
    data_cfg, kernel_cfg = cfg["data"], cfg["kernel"]
    ip_cfg, pls_cfg, svgp_cfg = cfg["inducing_points"], cfg["pls"], cfg["svgp"]
    experiment_data = get_experiment_data(
        curve_function=curve_function,
        number_of_data_points=data_cfg["number_of_data_points"],
        seed=data_cfg["seed"],
        sigma_true=data_cfg["sigma_true"],
        number_of_test_intervals=data_cfg["number_of_test_intervals"],
        total_number_of_intervals=data_cfg["total_number_of_intervals"],
        validation_data_percentage=data_cfg["validation_data_percentage"],
    )
    name = experiment_data.name
    gp_models = exact_gp_runner(
        experiment_data=experiment_data,
        kernel=ARDKernel(
            lengthscales=jnp.ones(experiment_data.train.x.shape[1]),
            outputscale=jnp.asarray(1.0),
        ),
        subsample_size=kernel_cfg["subsample_size"],
        seed=kernel_cfg["seed"],
        number_of_epochs=kernel_cfg["number_of_epochs"],
        learning_rate=kernel_cfg["learning_rate"],
        number_of_iterations=kernel_cfg["number_of_iterations"],
        early_stopper_patience=kernel_cfg["early_stopper_patience"],
        plot_loss_path=None,
        model_path=os.path.join(workdir, name, "gp"),
        data_path=os.path.join(workdir, name, "data"),
    )
    kernel = construct_average_ard_kernel([m.kernel for m in gp_models])
    likelihood = construct_average_gaussian_likelihood_from_models(gp_models)
    inducing_points = inducing_points_runner(
        seed=ip_cfg["seed"],
        inducing_point_selector=ConditionalVarianceInducingPointSelector(),
        data=experiment_data.train,
        number_induce_points=int(
            ip_cfg["inducing_points_factor"]
            * math.pow(
                experiment_data.train.x.shape[0], 1 / ip_cfg["inducing_points_power"]
            )
        ),
        kernel=kernel,
    )
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=inducing_points.x)
    cost = GaussianCost(
        observation_noise=likelihood.noise,
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
    )
    row = {"curve": name}
    for scaling in ("reference", "nystrom"):
        basis = build_orthonormal_basis(
            kernel=pls_kernel,
            x_induce=inducing_points.x,
            x_train=experiment_data.train.x,
            scaling=scaling,
            verbose=False,
            # truncated Nystrom: the 1/lambda columns make the Langevin
            # stiffness (N/s^2)/lambda_min — untruncated tiny eigenvalues put
            # the stable step below any practical grid on 1-D grams
            relative_eigenvalue_threshold=1e-5 if scaling == "nystrom" else None,
        )
        pls = PLS(basis=basis, cost=cost)
        particles = pls.initialise_particles(
            number_of_particles=pls_cfg["number_of_particles"],
            noise_only=pls_cfg["initial_particles_noise_only"],
            seed=pls_cfg["seed"],
        )
        particles, best_lr, _ = train_pls_runner(
            pls=pls,
            particles=particles,
            particle_name=f"{name}-{scaling}",
            experiment_data=experiment_data,
            simulation_duration=pls_cfg["simulation_duration"],
            maximum_number_of_steps=int(pls_cfg["maximum_number_of_steps"]),
            step_size_upper=pls_cfg["step_size_upper"],
            number_of_step_searches=pls_cfg["number_of_step_searches"],
            minimum_change_in_energy_potential=pls_cfg[
                "minimum_change_in_energy_potential"
            ],
            seed=pls_cfg["seed"],
            metric_to_optimise=pls_cfg["metric_to_optimise"],
            early_stopper_patience=pls_cfg["early_stopper_patience"],
        )
        pred = pls.predict(x=experiment_data.test.x, particles=particles, key=0)
        row[f"{scaling}_mse"] = calculate_mse(pred, experiment_data.test.y)
        row[f"{scaling}_nll"] = calculate_nll(pred, experiment_data.test.y)
    svgp, _, _ = train_svgp_runner(
        model_name=f"{name}-svgp",
        experiment_data=experiment_data,
        inducing_points=inducing_points,
        kernel=pls_kernel,
        likelihood=GaussianLikelihood(noise=likelihood.noise),
        seed=svgp_cfg["seed"],
        number_of_epochs=svgp_cfg["number_of_epochs"],
        batch_size=svgp_cfg["batch_size"],
        learning_rate_upper=svgp_cfg["learning_rate_upper"],
        learning_rate_lower=svgp_cfg["learning_rate_lower"],
        number_of_learning_rate_searches=svgp_cfg["number_of_learning_rate_searches"],
        is_fixed=True,
        observation_noise=float(likelihood.noise),
        mean_constant=0.0,
        early_stopper_patience=svgp_cfg["early_stopper_patience"],
        models_path=os.path.join(workdir, name, "svgp"),
        plot_title=None,
        plot_loss_path=None,
    )
    if svgp is not None:
        pred = svgp.predict_y(experiment_data.test.x)
        row["svgp_mse"] = calculate_mse(pred, experiment_data.test.y)
        row["svgp_nll"] = calculate_nll(pred, experiment_data.test.y)
    return row


def main() -> None:
    here = os.path.dirname(os.path.realpath(__file__))
    with open(os.path.join(here, "curves", "regression", "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    # denser step-size grid + longer simulated time than the stock config,
    # for BOTH scalings: the nystrom drift matrix is stiffer (columns scale
    # 1/lambda vs 1/sqrt(lambda)) — its stability window can fall between 3
    # log-spaced candidates, and the stock duration 0.1 is shorter than the
    # slowest mode's relaxation time 1/sigma_min ~ lambda_max, which leaves
    # large-column coordinates visibly unconverged
    cfg["pls"]["number_of_step_searches"] = 6
    cfg["pls"]["simulation_duration"] = 1.0
    cfg["pls"]["maximum_number_of_steps"] = 1e6
    rows = []
    with tempfile.TemporaryDirectory() as workdir:
        for curve_function in CURVE_FUNCTIONS:
            try:
                rows.append(run_curve(curve_function, cfg, workdir))
                print(rows[-1])
            except Exception as e:  # keep the sweep alive per-curve
                print(f"{type(curve_function).__name__} failed: {e}")
    out = [
        "# ONB scaling comparison — 10 synthetic curves (test split)",
        "",
        "Same learned kernel, inducing points, protocol (curve regression",
        "config with simulation_duration 1.0 and a 6-candidate step-size",
        "grid for every column — the stock 0.1 is shorter than the slowest",
        "OU mode's relaxation time) — only the ONB eigenvector scaling",
        "differs. SVGP (fixed kernel) is the baseline.",
        "",
        "| curve | ref MSE | nystrom MSE | svgp MSE | ref NLL | nystrom NLL | svgp NLL |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        # a column's runner may have returned None (e.g. no SVGP candidate
        # kept) — default the missing metrics so one bad curve cannot lose
        # the whole multi-hour sweep's summary
        for key in (
            "reference_mse", "nystrom_mse", "svgp_mse",
            "reference_nll", "nystrom_nll", "svgp_nll",
        ):
            r.setdefault(key, float("nan"))
        out.append(
            "| {curve} | {reference_mse:.4f} | {nystrom_mse:.4f} | {svgp_mse:.4f} "
            "| {reference_nll:.4f} | {nystrom_nll:.4f} | {svgp_nll:.4f} |".format(**r)
        )
    path = os.path.join(os.path.dirname(here), "results", "onb_scaling_comparison.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    import jax

    if os.environ.get("PLST_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
    main()
