"""Performance-profiling harness (reference ``experiments/profiler/main.py``):
sweep N (data points), M (inducing points), T (epochs), J (particles) one
axis at a time over several seeds, timing PLS training vs SVGP training, and
write per-sweep CSVs + errorbar plots.

TPU-native measurement: the reference wraps a ``model_training`` region in
``torch.profiler`` and reads CPU time (``main.py:126-196``); here the whole
Langevin run is one compiled program, so the honest equivalent is wall-clock
around ``block_until_ready`` with a separate (excluded) compile warm-up.
Optionally wraps runs in ``jax.profiler.trace`` for TensorBoard inspection.

Usage: python experiments/profiler/main.py --config_path experiments/profiler/config.yaml
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import yaml

from experiments.curves.curves import Curve2
from experiments.utils import create_directory
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.gaussian_process import (
    GaussianLikelihood,
    init_svgp,
)
from projected_langevin_sampling_tpu.models.gaussian_process.training import fit_svgp
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import _train_pls_scan

parser = argparse.ArgumentParser(description="Profiler sweeps for PLS vs SVGP.")
parser.add_argument("--config_path", type=str, required=True)
parser.add_argument("--trace_dir", type=str, default=None,
                    help="Optional jax.profiler trace output directory.")
parser.add_argument("--fast_path", type=str, default="auto",
                    choices=["auto", "spectral", "quadratic", "off"])


def _make_problem(n: int, m: int, seed: int, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0), dtype=dtype)
    y = jnp.asarray(
        np.asarray(Curve2().regression(x=x, sigma_true=0.2, key=seed)), dtype=dtype
    )
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([1.0], dtype=dtype),
            outputscale=jnp.asarray(1.0, dtype=dtype),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-3, 3, m)[:, None], dtype=dtype)
    basis = build_orthonormal_basis(kernel, z, x, verbose=False)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(1.0, dtype=dtype))
    return basis, cost, kernel, z


def profile_pls(n, m, t, j, seed, fast_path, step_size=1e-10) -> float:
    """Milliseconds of PLS training (reference profile_pls, step_size 1e-10
    so numbers measure compute, not dynamics)."""
    basis, cost, _, _ = _make_problem(n, m, seed)
    particles = basis.initialise_particles(j, key=seed)
    key = jax.random.key(seed)
    # warm-up compiles; excluded like torch.profiler excludes tracer setup
    jax.block_until_ready(
        _train_pls_scan(basis, cost, particles, key, step_size, float("inf"), t, fast_path).particles
    )
    start = time.perf_counter()
    result = _train_pls_scan(
        basis, cost, particles, key, step_size, float("inf"), t, fast_path
    )
    jax.block_until_ready(result.particles)
    return (time.perf_counter() - start) * 1e3


def profile_svgp(n, m, t, seed, learning_rate=1e-10) -> float:
    """Milliseconds of SVGP training (reference profile_svgp: full-batch SGD
    on the ELBO with frozen kernel/noise)."""
    basis, cost, kernel, z = _make_problem(n, m, seed)
    svgp = init_svgp(
        0.0, kernel, GaussianLikelihood(noise=jnp.asarray(1.0, dtype=jnp.float32)), z
    )
    x, y = kernel.approximation_samples, cost.y_train
    # warm-up
    fit_svgp(svgp, x, y, number_of_epochs=1, batch_size=n,
             learning_rate=learning_rate, learn_kernel_parameters=False,
             learn_observation_noise=False, key=seed)
    start = time.perf_counter()
    fit_svgp(svgp, x, y, number_of_epochs=t, batch_size=n,
             learning_rate=learning_rate, learn_kernel_parameters=False,
             learn_observation_noise=False, key=seed)
    return (time.perf_counter() - start) * 1e3


def _sweep_values(cfg: dict) -> list[int]:
    return list(range(cfg["start"], cfg["stop"] + 1, cfg["step"]))


def run_sweeps(config: dict, outputs_path: str, fast_path: str) -> None:
    defaults = {
        "n": config["number_of_data_points"]["default"],
        "m": config["number_of_induce_points"]["default"],
        "t": config["number_of_epochs"]["default"],
        "j": config["number_of_particles"]["default"],
    }
    axes = {
        "number_of_data_points": ("n", _sweep_values(config["number_of_data_points"])),
        "number_of_induce_points": ("m", _sweep_values(config["number_of_induce_points"])),
        "number_of_epochs": ("t", _sweep_values(config["number_of_epochs"])),
        "number_of_particles": ("j", _sweep_values(config["number_of_particles"])),
    }
    seeds = range(config["profiler"]["number_of_seeds"])
    create_directory(outputs_path)

    for axis_name, (param, values) in axes.items():
        rows = []
        for value in values:
            args_ = dict(defaults)
            args_[param] = value
            for seed in seeds:
                pls_ms = profile_pls(
                    args_["n"], args_["m"], args_["t"], args_["j"], seed, fast_path
                )
                rows.append([axis_name, value, seed, "pls", pls_ms])
                if param != "j":  # SVGP has no particle axis
                    svgp_ms = profile_svgp(args_["n"], args_["m"], args_["t"], seed)
                    rows.append([axis_name, value, seed, "svgp", svgp_ms])
            print(f"{axis_name}={value} done", flush=True)
        df = pd.DataFrame(
            rows, columns=["axis", "value", "seed", "model", "wall_time_milliseconds"]
        )
        df.to_csv(os.path.join(outputs_path, f"{axis_name}.csv"), index=False)
        _plot_sweep(df, axis_name, outputs_path)


def _plot_sweep(df: pd.DataFrame, axis_name: str, outputs_path: str) -> None:
    fig, ax = plt.subplots(figsize=(7, 4))
    for model, group in df.groupby("model"):
        stats = group.groupby("value")["wall_time_milliseconds"].agg(["mean", "std"])
        ax.errorbar(stats.index, stats["mean"], yerr=stats["std"], marker="o",
                    markersize=3, capsize=3, label=model)
    ax.set_xlabel(axis_name)
    ax.set_ylabel("wall time (ms)")
    ax.set_yscale("log")
    ax.legend()
    ax.set_title(f"Training time vs {axis_name}")
    fig.savefig(os.path.join(outputs_path, f"{axis_name}.png"), bbox_inches="tight", dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    args = parser.parse_args()
    with open(args.config_path) as f:
        config = yaml.safe_load(f)
    outputs_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), "outputs"
    )
    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            run_sweeps(config, outputs_path, args.fast_path)
    else:
        run_sweeps(config, outputs_path, args.fast_path)
