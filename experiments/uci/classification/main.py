"""UCI binary-classification experiments (reference
``experiments/uci/classification/main.py``): 8 datasets, PLS-ONB with the
Bernoulli(sigmoid) cost plus an SVGP (probit) baseline; acc/auc/f1 + nll
metric CSVs aggregated across datasets.
"""

from __future__ import annotations

import argparse
import math
import os
import pickle
import traceback

import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from experiments.constructors import (
    construct_average_ard_kernel,
    construct_average_mean_constant,
)
from experiments.data import ExperimentData, ProblemType
from experiments.loaders import load_pls, load_svgp, save_pls, save_svgp
from experiments.metrics import calculate_metrics, calculate_nll, concatenate_metrics
from experiments.plotters import plot_eigenvalues
from experiments.preprocess import set_up_experiment
from experiments.runners import (
    dirichlet_exact_gp_runner,
    inducing_points_runner,
    train_pls_runner,
    train_svgp_runner,
)
from experiments.uci.constants import (
    EXTRA_CLASSIFICATION_DATASETS,
    ClassificationDatasetSchema,
    resolve_schema,
)
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    make_smoothed_bernoulli_cost,
    residual_smoothing_std,
)
from projected_langevin_sampling_tpu.models.gaussian_process import BernoulliLikelihood
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.link_functions import SigmoidLinkFunction
from projected_langevin_sampling_tpu.models.mean_constant import fit_mean_constant_map
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

parser = argparse.ArgumentParser(description="Main script for UCI classification experiments.")
parser.add_argument("--config_path", type=str, required=True)
parser.add_argument("--data_seed", type=int, required=False, default=-1)
parser.add_argument("--dataset", type=str, required=False, default=None)
parser.add_argument(
    "--outputs_dirname", type=str, required=False, default="outputs",
    help="outputs subdirectory (use a distinct one for non-default configs)",
)

MODEL_NAMES = ["pls-onb", "svgp"]
METRICS = ["acc", "auc", "f1", "nll"]


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
    y_raw = df[output_column]
    if y_raw.dtype == object:
        labels = sorted(y_raw.unique())
        y_raw = y_raw.map({label: i for i, label in enumerate(labels)})
    y_num = y_raw.to_numpy(dtype=float)
    # Binarise by the two observed values, not by sign: `> 0` collapses the
    # common numeric {1, 2} UCI class coding into a single class (and {0, 1}
    # / {-1, 1} codings map identically either way).
    values = np.unique(y_num)
    if values.shape[0] != 2:
        raise ValueError(
            f"{dataset_name}: expected binary labels, got {values.shape[0]} "
            f"distinct values {values[:5]}"
        )
    y = jnp.asarray((y_num == values.max()).astype(float))
    return set_up_experiment(
        name=dataset_name,
        problem_type=ProblemType.CLASSIFICATION,
        seed=seed,
        x=x,
        y=y,
        train_data_percentage=train_data_percentage,
        validation_data_percentage=validation_data_percentage,
        normalise=False,
    )


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
) -> None:
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
            path=experiment_data_path, problem_type=ProblemType.CLASSIFICATION
        )
    else:
        experiment_data = get_experiment_data(
            seed=data_seed,
            train_data_percentage=data_config["train_data_percentage"],
            validation_data_percentage=data_config["validation_data_percentage"],
            dataset_name=dataset_name,
        )
        experiment_data.save(experiment_data_path)

    # kernel hyperparameters from subsample GPs on the Dirichlet-transformed
    # labels (reference main.py:133-160 — DirichletClassificationLikelihood):
    # logit-scale targets per class with fixed per-point noise
    subsample_gp_models = dirichlet_exact_gp_runner(
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
    mean_constant = construct_average_mean_constant(subsample_gp_models)

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
    # prior mean constant mode (opt-in; reference parity is zero-mean):
    #   "gp"     — inherit the learned GP ConstantMean the harness already
    #              hands SVGP (reference gives it to SVGP only, main.py:190-193)
    #   "select" — train under BOTH the zero mean and the GP constant, keep
    #              the better train-split NLL (same selection principle as
    #              the step-size search; the GP constant helps when the
    #              Dirichlet-kernel fit is good and hurts when it is not)
    #   "map"    — empirical-Bayes: the constant that maximises the penalised
    #              posterior jointly over [m0; U] (the PLS analogue of SVGP's
    #              ELBO-trained ConstantMean — see models/mean_constant.py)
    m0_mode = pls_config.get("mean_constant")
    if m0_mode == "gp":
        m0_candidates = [float(mean_constant)]
    elif m0_mode == "select":
        m0_candidates = [0.0, float(mean_constant)]
    else:
        m0_candidates = [0.0]
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
        relative_eigenvalue_threshold=pls_config.get(
            "onb_relative_eigenvalue_threshold"
        ),
        mean_constant=m0_candidates[0],
    )
    cost = BernoulliCost(
        y_train=experiment_data.train.y, link_function=SigmoidLinkFunction()
    )
    # FITC-style residual smoothing (opt-in; requires onb_scaling "nystrom"):
    # train the particles against the same expected log-likelihood SVGP's
    # ELBO uses — E_{eps~N(0, k_ii - Q_ii)}[log p(y_i | f_i + eps)] — instead
    # of the raw projected likelihood. See models/costs/smoothed_bernoulli.py
    # for the train-time symmetry argument.
    if pls_config.get("cost_smoothing") == "residual":
        smoothing_std = residual_smoothing_std(
            onb_basis, average_ard_kernel(experiment_data.train.x, diag=True)
        )
        cost = make_smoothed_bernoulli_cost(
            y_train=experiment_data.train.y, smoothing_std=smoothing_std
        )
    pls_name = "pls-onb"
    pls_path = os.path.join(models_path, f"{pls_name}.pkl")
    if m0_mode == "map" and not os.path.exists(pls_path):
        # Only fit when actually training: on the load path load_pls restores
        # the checkpointed mean constant and the Newton fit would be discarded.
        m0_map = fit_mean_constant_map(basis=onb_basis, cost=cost)
        print(f"  [mean-constant map] m0={m0_map:.4f}", flush=True)
        m0_candidates = [m0_map]
        onb_basis = onb_basis.replace(mean_constant=m0_map)
    pls = PLS(basis=onb_basis, cost=cost, name=pls_name)
    plot_eigenvalues(
        basis=onb_basis,
        save_path=os.path.join(plots_path, "eigenvalues-pls-onb.png"),
        title=f"Eigenvalues ({dataset_name})",
    )
    particles = pls.initialise_particles(
        number_of_particles=pls_config["number_of_particles"],
        noise_only=pls_config["initial_particles_noise_only"],
        seed=pls_config["seed"],
    )
    if os.path.exists(pls_path):
        # load_pls restores the winning mean constant from the checkpoint
        particles, _, _, _ = load_pls(pls_path, pls=pls)
    else:
        best = None  # (train_nll, m0, particles, best_lr, number_of_epochs)
        init_particles = particles
        for m0 in m0_candidates:
            pls.basis = onb_basis.replace(mean_constant=m0)
            particles_c, best_lr, number_of_epochs = train_pls_runner(
                pls=pls,
                particles=init_particles,
                particle_name=pls.name,
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
            if len(m0_candidates) == 1:
                best = (float("nan"), m0, particles_c, best_lr, number_of_epochs)
                break
            prediction = pls.predict(
                x=experiment_data.train.x, particles=particles_c, key=0
            )
            train_nll = calculate_nll(
                prediction=prediction, y=experiment_data.train.y
            )
            print(
                f"  [mean-constant select] m0={m0:.4f} train_nll={train_nll:.4f}",
                flush=True,
            )
            if best is None or train_nll < best[0]:
                best = (train_nll, m0, particles_c, best_lr, number_of_epochs)
        _, best_m0, particles, best_lr, number_of_epochs = best
        pls.basis = onb_basis.replace(mean_constant=best_m0)
        save_pls(
            pls_path,
            particles=particles,
            observation_noise=pls.observation_noise,
            best_lr=best_lr,
            number_of_epochs=number_of_epochs,
            mean_constant=best_m0,
            basis=pls.basis,
        )
    calculate_metrics(
        model=pls,
        particles=particles,
        model_name=pls.name,
        dataset_name=dataset_name,
        experiment_data=experiment_data,
        results_path=results_path,
        plots_path=plots_path,
        coverage=metrics_config["coverage"],
    )

    svgp_path = os.path.join(models_path, "svgp.pkl")
    if os.path.exists(svgp_path):
        svgp, _, _ = load_svgp(svgp_path, likelihood=BernoulliLikelihood())
    else:
        svgp, losses, best_learning_rate = train_svgp_runner(
            model_name="svgp",
            experiment_data=experiment_data,
            inducing_points=inducing_points,
            kernel=pls_kernel,
            likelihood=BernoulliLikelihood(),
            seed=svgp_config["seed"],
            number_of_epochs=svgp_config["number_of_epochs"],
            batch_size=svgp_config["batch_size"],
            learning_rate_upper=svgp_config["learning_rate_upper"],
            learning_rate_lower=svgp_config["learning_rate_lower"],
            number_of_learning_rate_searches=svgp_config[
                "number_of_learning_rate_searches"
            ],
            is_fixed=True,
            mean_constant=float(mean_constant),
            early_stopper_patience=svgp_config["early_stopper_patience"],
            models_path=os.path.join(models_path, "svgp-kernel-iterations"),
            plot_title=f"SVGP ({dataset_name})",
            plot_loss_path=plots_path,
        )
        if svgp is not None:
            save_svgp(svgp_path, svgp, losses, best_learning_rate)
    if svgp is not None:
        calculate_metrics(
            model=svgp,
            model_name="svgp",
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
    # (constants.EXTRA_CLASSIFICATION_DATASETS); the full sweep stays the
    # reference's 8-dataset list
    if args.dataset and args.dataset in EXTRA_CLASSIFICATION_DATASETS:
        dataset_names = [args.dataset]
    elif args.dataset:
        dataset_names = [ClassificationDatasetSchema(args.dataset).value]
    else:
        dataset_names = [d.value for d in ClassificationDatasetSchema]
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
                )
            except Exception as e:
                # full traceback: a swallowed config typo otherwise turns a
                # multi-hour sweep into an exit-0 run with empty outputs and
                # nothing to diagnose
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
