"""Quantitative summary of the mixture-likelihood (multimodal) runs.

The reference demonstrates this capability only as a GIF
(reference ``README.md:33-36``, ``experiments/curves/mixture_likelihood/``):
data generated from a curve with an unknown constant shift (Bernoulli
presence, p=0.5, shift=20) and PLS trained with the MultiModal cost whose
likelihood is the two-component mixture.  A correct sampler must keep
particles in BOTH modes — a Gaussian variational posterior (SVGP) is
structurally unable to.  This script turns the saved particle clouds into
numbers: per curve, the particle split across the two modes and the
estimated mode separation (true value: the configured shift).

Writes ``results/mixture_summary.md`` as a markdown fragment consumed by
``experiments/make_results_summary.py``.
"""

from __future__ import annotations

import argparse
import os

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import yaml

from experiments.curves.common import learn_kernel_and_inducing_points
from experiments.curves.curves import CURVE_FUNCTIONS
from experiments.curves.mixture_likelihood.main import get_experiment_data
from experiments.loaders import load_pls
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import MultiModalCost
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS

ROOT = os.path.dirname(os.path.realpath(__file__))


def summarise_curve(curve_function, config: dict, outputs_dirname: str) -> dict | None:
    data_config = config["data"]
    curve_name = type(curve_function).__name__.lower()
    outputs_path = os.path.join(ROOT, outputs_dirname)
    pls_path = os.path.join(outputs_path, "models", curve_name, "pls-onb.pkl")
    if not os.path.exists(pls_path):
        return None
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
    (_, _, _, _, inducing_points, pls_kernel) = learn_kernel_and_inducing_points(
        experiment_data=experiment_data,
        kernel_config=config["kernel"],
        inducing_points_config=config["inducing_points"],
        models_path=os.path.join(outputs_path, "models", curve_name),
        data_path=os.path.join(outputs_path, "data", curve_name),
        plot_curve_path=os.path.join(outputs_path, "plots", curve_name),
    )
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=config["pls"].get("onb_scaling", "reference"),
    )
    cost = MultiModalCost(
        observation_noise=jnp.asarray(data_config["sigma_true"]),
        y_train=experiment_data.train.y,
        link_function=IdentityLinkFunction(),
        shift=data_config["bernoulli_shift_true"],
        bernoulli_noise=data_config["bernoulli_probability_true"],
    )
    pls = PLS(basis=onb_basis, cost=cost, name="pls-onb")
    particles, _, best_lr, _ = load_pls(pls_path, pls=pls)
    if best_lr is None:
        # the step-size search kept no candidate: the stored particles are
        # the initialisation, not a posterior — report the failure, not the
        # init cloud's (meaningless) spread.
        return {
            "curve": curve_name,
            "n_lower": None,
            "n_upper": None,
            "est_shift": float("nan"),
            "true_shift": float(data_config["bernoulli_shift_true"]),
            "bimodal": False,
            "no_candidate": True,
        }
    preds = pls.predict_untransformed_samples(
        particles=particles, x=experiment_data.train.x
    )
    # One scalar per particle: its mean untransformed value over the train
    # inputs. The mixture likelihood admits modes at f=curve and
    # f=curve+shift, so these cluster at {mean(curve), mean(curve)+shift}.
    per_particle = jnp.mean(preds, axis=0)
    shift = float(data_config["bernoulli_shift_true"])
    # Assign each particle to the nearer mode anchor. The observations are
    # UNSHIFTED (get_experiment_data adds the shift only to y_untransformed),
    # so the train-data level anchors the curve mode — robust even if the
    # cloud collapses entirely into one mode.
    anchor = float(jnp.mean(experiment_data.train.y))
    threshold = anchor + shift / 2.0
    upper = per_particle >= threshold
    n_upper = int(jnp.sum(upper))
    n_lower = int(per_particle.shape[0]) - n_upper
    est_shift = (
        float(jnp.mean(per_particle[upper]) - jnp.mean(per_particle[~upper]))
        if 0 < n_upper < per_particle.shape[0]
        else float("nan")
    )
    return {
        "curve": curve_name,
        "n_lower": n_lower,
        "n_upper": n_upper,
        "est_shift": est_shift,
        "true_shift": shift,
        "bimodal": 0 < n_upper < per_particle.shape[0],
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outputs_dirname", type=str, default="outputs")
    parser.add_argument(
        "--config_name",
        type=str,
        default=None,
        help="Config file name; defaults to config.yaml (the pls block's "
        "discretisation does not affect the summary, only the data/basis).",
    )
    args = parser.parse_args()
    config_name = args.config_name or "config.yaml"
    with open(os.path.join(ROOT, config_name)) as f:
        config = yaml.safe_load(f)
    rows = []
    for curve_function in CURVE_FUNCTIONS:
        row = summarise_curve(curve_function, config, args.outputs_dirname)
        if row is not None:
            rows.append(row)
            print(row)
    lines = [
        "| curve | particles in curve mode | particles in shifted mode | "
        "estimated shift (true %.0f) | bimodal |" % config["data"]["bernoulli_shift_true"],
        "|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: r["curve"]):
        if r.get("no_candidate"):
            lines.append(
                "| {curve} | (step-size search kept no candidate) | — | — | NO |".format(**r)
            )
        else:
            lines.append(
                "| {curve} | {n_lower} | {n_upper} | {est_shift:.2f} | {mark} |".format(
                    mark="yes" if r["bimodal"] else "NO", **r
                )
            )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(ROOT))), "results")
    os.makedirs(out, exist_ok=True)
    suffix = "" if args.outputs_dirname == "outputs" else "_" + args.outputs_dirname.replace("outputs_", "")
    path = os.path.join(out, f"mixture_summary{suffix}.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
