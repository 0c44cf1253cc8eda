"""Poisson (square-link) head-to-head QUALITY study (round-5 follow-up to the
round-4 verdict: "the full cost zoo needs quality evidence, not just parity
tests").

The reference's Poisson experiment (``curves/poisson_regression/main.py``)
trains PLS only — there is no baseline model in its grid because gpytorch's
SVGP has no square-link Poisson likelihood. This study therefore measures the
VALUE of the Poisson cost itself: on the reference's own 10 synthetic curves,
with counts drawn fresh per data seed (n seeds, reference n=10 standard),

    pls-onb / pls-ipb   PLS with PoissonCost + SquareLinkFunction
    svgp-gaussian       SVGP with a Gaussian likelihood trained on the raw
                        counts — the model a practitioner falls back to
                        without a count likelihood

are compared on the held-out interval split by
  * test count NLL — the log score of each model's predictive (Poisson
    plug-in for PLS, Gaussian for SVGP; log scores of different predictive
    families on the same data are directly comparable), and
  * rate RMSE vs the TRUE generating rate (the synthetic oracle the UCI
    studies never have).

Per-seed results append (never clobber) to ``results/poisson_study_long.csv``
so interrupted sweeps resume; rerun a finished cell by deleting its outputs
tree.

Usage:
    python experiments/curves/poisson_regression/study.py \
        --config_path experiments/curves/poisson_regression/config.yaml \
        --curves 1,2,3,4,5 --seeds 0,1,2,3,4,5,6,7,8,9
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from experiments.curves.common import learn_kernel_and_inducing_points
from experiments.curves.curves import CURVE_FUNCTIONS
from experiments.curves.poisson_regression.main import get_experiment_data
from experiments.loaders import load_pls, load_svgp, save_pls, save_svgp
from experiments.metrics import calculate_metrics
from experiments.runners import train_pls_runner, train_svgp_runner
from experiments.utils import create_directory
from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import PoissonCost
from projected_langevin_sampling_tpu.models.gaussian_process import (
    GaussianLikelihood,
)
from projected_langevin_sampling_tpu.models.link_functions import SquareLinkFunction
from projected_langevin_sampling_tpu.models.mean_constant import fit_mean_constant_map
from projected_langevin_sampling_tpu.models.pls import PLS

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
)
LONG_CSV = os.environ.get(
    "PLST_POISSON_LONG_CSV", os.path.join(ROOT, "results", "poisson_study_long.csv")
)

parser = argparse.ArgumentParser(description="Poisson cost head-to-head study.")
parser.add_argument("--config_path", type=str, required=True)
parser.add_argument("--curves", type=str, default=",".join(str(i + 1) for i in range(len(CURVE_FUNCTIONS))))
parser.add_argument("--seeds", type=str, default="0,1,2,3,4,5,6,7,8,9")
parser.add_argument("--outputs_dirname", type=str, default="outputs_study")
parser.add_argument(
    "--models",
    type=str,
    default="pls-onb,pls-onb-m0,pls-ipb,svgp-gaussian",
    help="comma list; per-model committed rows self-skip, so e.g. "
    "'--models pls-onb-hs' back-fills the production-protocol variant into "
    "cells whose reference-protocol rows are already committed",
)

# Production-protocol PLS variant ("pls-onb-hs"): the reference's Poisson
# config is a PLOTS-ONLY DEMO — simulation_duration 0.1 with
# early_stopper_patience 1e-3 stops every chain at the first energy plateau
# (~3k steps), long before the data term can pull the rate toward the
# counts (train rate mean ~22 vs y mean ~3 on curve1; the committed
# reference-protocol rows in results/poisson_study_long.csv record exactly
# that). This variant trains the SAME model under the UCI-grade budget
# (the headline protocols' duration/patience shape,
# uci/classification/config_precond_smooth.yaml) — measuring what the
# Poisson cost delivers when trained like production, against the same
# SVGP-Gaussian baseline.
HS_RECIPE = dict(
    simulation_duration=0.5,
    early_stopper_patience=0.1,  # sim-time units, 20% of T (vs the demo's 1e-3)
    maximum_number_of_steps=1_000_000,
    number_of_step_searches=4,
    step_size_upper=1.0e-3,
    discretisation="preconditioned",
)


def _point_rate(model, particles, x):
    """Point rate estimate on x: Poisson predictive rate for PLS, Gaussian
    predictive mean (= expected counts) for SVGP."""
    if isinstance(model, PLS):
        pred = model(x=x, particles=particles, key=0)
    else:
        pred = model.predict_y(x)
    return np.asarray(pred.mean).reshape(-1), pred


def _merge_rows(rows: list[dict]) -> None:
    """Merge under an exclusive flock: the CPU lane (reference-protocol
    seeds) and the chip queue (hs back-fill) both append to the long CSV —
    an unlocked read-modify-write could drop a finished cell."""
    import fcntl

    create_directory(os.path.dirname(LONG_CSV))
    keys = ["curve", "seed", "model", "metric", "split"]
    with open(LONG_CSV + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        fresh = pd.DataFrame(rows)
        if os.path.exists(LONG_CSV):
            fresh = pd.concat([fresh, pd.read_csv(LONG_CSV)], ignore_index=True)
        tmp = LONG_CSV + ".tmp"
        fresh.drop_duplicates(subset=keys, keep="first").sort_values(keys).to_csv(
            tmp, index=False
        )
        os.replace(tmp, LONG_CSV)


def run_cell(
    curve_function, seed: int, config: dict, outputs_path: str,
    models_requested: tuple[str, ...] = (
        "pls-onb", "pls-onb-m0", "pls-ipb", "svgp-gaussian",
    ),
) -> None:
    curve_name = type(curve_function).__name__.lower()
    data_config = config["data"]
    experiment_data = get_experiment_data(
        curve_function=curve_function,
        number_of_data_points=data_config["number_of_data_points"],
        seed=seed,
        number_of_test_intervals=data_config["number_of_test_intervals"],
        total_number_of_intervals=data_config["total_number_of_intervals"],
    )
    base = os.path.join(outputs_path, str(seed))
    data_path = os.path.join(base, "data", curve_name)
    models_path = os.path.join(base, "models", curve_name)
    results_path = os.path.join(base, "results", curve_name)
    plots_path = os.path.join(base, "plots", curve_name)
    for p in (data_path, models_path, results_path, plots_path):
        create_directory(p)

    pls_config = config["pls"]
    cost = PoissonCost(
        y_train=experiment_data.train.y, link_function=SquareLinkFunction()
    )
    models = {}
    needs_raw_kernel = bool(
        set(models_requested) & {"pls-onb", "pls-onb-m0", "pls-ipb", "svgp-gaussian"}
    )
    likelihood = mean_constant = inducing_points = pls_kernel = None
    if needs_raw_kernel:
        (_, _, likelihood, mean_constant, inducing_points, pls_kernel) = (
            learn_kernel_and_inducing_points(
                experiment_data=experiment_data,
                kernel_config=config["kernel"],
                inducing_points_config=config["inducing_points"],
                models_path=models_path,
                data_path=data_path,
                plot_curve_path=plots_path,
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
        # HEADLINE-STACK analogue (the UCI protocols' mean_constant=map):
        # without a prior mean the square-link rate reverts to f^2 -> 0 on
        # the held-out interval, so extrapolative test NLL explodes (the
        # reference's own committed numbers show the same collapse —
        # RESULTS.md curve-Poisson table); SVGP meanwhile reverts to its
        # TRAINED ConstantMean. m0 gives PLS the same single empirical-Bayes
        # scalar (models/mean_constant.py; sqrt-mean-count start because the
        # square link is singular at f=0).
        m0 = fit_mean_constant_map(
            basis=onb_basis,
            cost=cost,
            initial_constant=float(np.sqrt(float(np.mean(np.asarray(experiment_data.train.y))) + 0.5)),
        )
        print(f"  [mean-constant map] m0={m0:.4f} (rate reversion {m0 * m0:.3f})", flush=True)
        models = {
            "pls-onb": PLS(basis=onb_basis, cost=cost),
            "pls-onb-m0": PLS(basis=onb_basis.replace(mean_constant=m0), cost=cost),
            "pls-ipb": PLS(basis=ipb_basis, cost=cost),
        }
    if "pls-onb-hs" in models_requested:
        # Production-protocol variant — three measured fixes over the demo
        # stack (each isolated with /tmp-diagnostics on curve1 seed 0,
        # round 5):
        #   1. LINK-SPACE KERNEL: the demo learns the kernel on the raw
        #      counts, so outputscale ~ Var(y) (~20) while the square-link
        #      latent lives at sqrt(rate) scale (~2). The mis-scaled prior
        #      injects variance ~20 into the held-out interval and the
        #      predictive rate explodes (E[f^2] adds the spread). Learning
        #      on the variance-stabilised sqrt(y + 3/8) (Anscombe) puts the
        #      prior at the latent's true scale.
        #   2. Consistent-KKL nystrom scaling (threshold 1e-2 for the fast
        #      1-D eigendecay) + the Lambda-preconditioned discretisation —
        #      the UCI headline stack for non-Gaussian costs.
        #   3. UCI-grade budget (HS_RECIPE): the demo's duration 0.1 /
        #      patience 1e-3 stops every chain at the first plateau
        #      (train rate mean ~22 vs y mean ~3 on curve1).
        hs_kernel_models = os.path.join(models_path, "hs_kernel")
        hs_kernel_data = os.path.join(data_path, "hs_kernel")
        create_directory(hs_kernel_models)
        create_directory(hs_kernel_data)
        sqrt_targets = jnp.sqrt(
            jnp.asarray(experiment_data.train.y, dtype=jnp.float32) + 0.375
        )
        (_, _, _, _, hs_inducing_points, hs_kernel) = (
            learn_kernel_and_inducing_points(
                experiment_data=experiment_data,
                kernel_config=config["kernel"],
                inducing_points_config=config["inducing_points"],
                models_path=hs_kernel_models,
                data_path=hs_kernel_data,
                plot_curve_path=None,
                regression_targets=sqrt_targets,
            )
        )
        hs_basis = build_orthonormal_basis(
            kernel=hs_kernel,
            x_induce=hs_inducing_points.x,
            x_train=experiment_data.train.x,
            scaling="nystrom",
            relative_eigenvalue_threshold=1e-2,
        )
        hs_m0 = fit_mean_constant_map(
            basis=hs_basis,
            cost=cost,
            initial_constant=float(
                np.sqrt(float(np.mean(np.asarray(experiment_data.train.y))) + 0.5)
            ),
        )
        print(f"  [hs m0] {hs_m0:.4f} (rate reversion {hs_m0 * hs_m0:.3f})", flush=True)
        models["pls-onb-hs"] = PLS(
            basis=hs_basis.replace(mean_constant=hs_m0), cost=cost
        )
    models = {n: m for n, m in models.items() if n in models_requested}
    rows = []
    for name, pls in models.items():
        pls_path = os.path.join(models_path, f"{name}.pkl")
        if os.path.exists(pls_path):
            particles, _, _, _ = load_pls(pls_path, pls=pls)
        else:
            particles = pls.initialise_particles(
                number_of_particles=pls_config["number_of_particles"],
                noise_only=pls_config["initial_particles_noise_only"],
                seed=pls_config["seed"],
            )
            schedule = dict(pls_config)
            if name == "pls-onb-hs":
                schedule.update(HS_RECIPE)
            particles, best_lr, n_epochs = train_pls_runner(
                pls=pls,
                particle_name=name,
                experiment_data=experiment_data,
                simulation_duration=schedule["simulation_duration"],
                maximum_number_of_steps=int(schedule["maximum_number_of_steps"]),
                early_stopper_patience=schedule["early_stopper_patience"],
                number_of_step_searches=schedule["number_of_step_searches"],
                step_size_upper=schedule["step_size_upper"],
                minimum_change_in_energy_potential=schedule[
                    "minimum_change_in_energy_potential"
                ],
                seed=schedule["seed"],
                particles=particles,
                metric_to_optimise=schedule["metric_to_optimise"],
                discretisation=schedule.get("discretisation", "euler"),
            )
            save_pls(pls_path, particles, None, best_lr, n_epochs, basis=pls.basis)
        calculate_metrics(
            model=pls,
            particles=particles,
            model_name=name,
            dataset_name=curve_name,
            experiment_data=experiment_data,
            results_path=results_path,
            plots_path=plots_path,
            coverage=config["metrics"]["coverage"] if "metrics" in config else 0.95,
        )
        rows.extend(
            _oracle_rows(name, pls, particles, experiment_data, curve_name, seed)
        )

    if "svgp-gaussian" in models_requested:
        svgp_path = os.path.join(models_path, "svgp-gaussian.pkl")
        svgp_likelihood = GaussianLikelihood(noise=likelihood.noise)
        svgp_config = config["svgp"]
        print(
            f"  [svgp-gaussian inputs] noise={float(likelihood.noise):.6g} "
            f"m0={float(mean_constant):.6g} "
            f"y mean={float(np.mean(np.asarray(experiment_data.train.y))):.6g} "
            f"std={float(np.std(np.asarray(experiment_data.train.y))):.6g} "
            f"dtype={experiment_data.train.y.dtype} "
            f"M={int(np.asarray(inducing_points.x).shape[0])}",
            flush=True,
        )
        if os.path.exists(svgp_path):
            svgp, _, _ = load_svgp(svgp_path, likelihood=svgp_likelihood)
        else:
            svgp, losses, best_learning_rate = train_svgp_runner(
                model_name="svgp-gaussian",
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
                models_path=os.path.join(models_path, "svgp-kernel-iterations"),
            )
            if svgp is not None:
                save_svgp(svgp_path, svgp, losses, best_learning_rate)
        if svgp is None:
            # every learning-rate candidate diverged to non-finite parameters —
            # record the PLS rows (already in ``rows``) and leave the svgp cells
            # absent; the section renderer pairs on common seeds so a missing
            # baseline never fabricates a delta
            print(
                f"[poisson-study] svgp-gaussian diverged at every learning rate "
                f"({curve_name} seed={seed}) — skipping its rows",
                flush=True,
            )
        else:
            calculate_metrics(
                model=svgp,
                model_name="svgp-gaussian",
                dataset_name=curve_name,
                experiment_data=experiment_data,
                results_path=results_path,
                plots_path=plots_path,
                coverage=config["metrics"]["coverage"] if "metrics" in config else 0.95,
            )
            rows.extend(
                _oracle_rows("svgp-gaussian", svgp, None, experiment_data, curve_name, seed)
            )

    # consolidate this cell's metric CSVs + oracle rows into the long CSV
    for model in models_requested:
        for split in ("train", "test"):
            for metric in ("nll", "mse", "mae"):
                f = os.path.join(results_path, model, f"{metric}_{split}.csv")
                if not os.path.exists(f):
                    continue
                value = float(pd.read_csv(f, index_col="dataset")[model].iloc[0])
                rows.append(
                    dict(
                        curve=curve_name, seed=seed, model=model,
                        metric=metric, split=split, value=value,
                    )
                )
    _merge_rows(rows)
    print(f"[poisson-study] merged {curve_name} seed={seed}", flush=True)


def _oracle_rows(name, model, particles, experiment_data, curve_name, seed):
    """Rate RMSE vs the TRUE generating rate on each split (oracle metric)."""
    rows = []
    for split in ("train", "test"):
        data = getattr(experiment_data, split)
        if data is None or data.y_untransformed is None:
            continue
        rate_hat, _ = _point_rate(model, particles, data.x)
        true_rate = np.asarray(data.y_untransformed).reshape(-1)
        rows.append(
            dict(
                curve=curve_name, seed=seed, model=name,
                metric="rate_rmse", split=split,
                value=float(np.sqrt(np.mean((rate_hat - true_rate) ** 2))),
            )
        )
    return rows


def main() -> None:
    args = parser.parse_args()
    with open(args.config_path) as f:
        config = yaml.safe_load(f)
    outputs_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), args.outputs_dirname
    )
    curve_ids = [int(c) for c in args.curves.split(",") if c]
    seeds = [int(s) for s in args.seeds.split(",") if s]
    requested = tuple(m for m in args.models.split(",") if m)
    done = None
    if os.path.exists(LONG_CSV):
        done = pd.read_csv(LONG_CSV)

    def _committed(curve_name: str, seed: int, model: str) -> bool:
        if done is None:
            return False
        return bool(
            (
                (done.curve == curve_name)
                & (done.seed == seed)
                & (done.model == model)
                & (done.metric == "nll")
                & (done.split == "test")
            ).any()
        )

    for curve_id in curve_ids:
        curve_function = CURVE_FUNCTIONS[curve_id - 1]
        curve_name = type(curve_function).__name__.lower()
        for seed in seeds:
            missing = []
            for m in requested:
                if m == "svgp-gaussian":
                    # a cell whose svgp baseline diverged (a deterministic
                    # outcome — retrying cannot change it) still counts as
                    # done when the cell itself completed (pls-onb-m0 proxy);
                    # its svgp rows simply stay absent from the long CSV
                    if _committed(curve_name, seed, m) or _committed(
                        curve_name, seed, "pls-onb-m0"
                    ):
                        continue
                elif _committed(curve_name, seed, m):
                    continue
                missing.append(m)
            if not missing:
                print(f"[poisson-study] skip (committed): {curve_name} seed={seed}")
                continue
            run_cell(
                curve_function, seed, config, outputs_path,
                models_requested=tuple(missing),
            )


if __name__ == "__main__":
    if os.environ.get("PLST_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)
    platform = os.environ.get("PLST_PLATFORM")
    if platform is None and jax.config.jax_enable_x64:
        platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)
    main()
