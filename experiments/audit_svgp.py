"""SVGP regression-baseline audit (round-4 VERDICT item #1).

Round 3's headline regression tables showed SVGP test NLLs (3.9 on the
boston stand-in, 1.9 on energy_cooling) that no competently-trained SVGP
produces on standardized targets. Root cause found in code review: the
``experiments/trainers.py::train_svgp`` shim passed
``learn_observation_noise=likelihood_noise is None`` — freezing the noise at
the averaged subsample-GP value — whereas in the reference the likelihood's
noise parameter is ALWAYS optimised (it lives in ``model.parameters()`` and
``train_svgp`` only ever excludes kernel parameters from the SGD param set,
reference ``experiments/trainers.py:79-95``; ``likelihood_noise`` merely
initialises ``model.likelihood.noise.data``).

This script validates the fixed trainer against a faithful PyTorch
re-implementation of the reference's gpytorch SVGP protocol (gpytorch itself
is not installed here; like ``bench_reference.py`` we re-create the ~100
relevant lines in plain torch, fp64):

  * whitened Cholesky variational distribution q(u) = N(L v, L S L^T) with
    S = CC^T, L = chol(K_zz + jitter) — gpytorch's ``VariationalStrategy``
    default (whitened) over ``CholeskyVariationalDistribution``;
  * likelihood noise through a softplus with gpytorch's GreaterThan(1e-4)
    constraint, initialised at the harness's averaged subsample-GP noise;
  * learnable constant mean (reference ``gpytorch.means.ConstantMean``),
    fixed PLS r-kernel (``is_fixed=True`` freezes kernel params + inducing
    locations, reference ``uci/regression/main.py:393``);
  * plain SGD on the per-data-point VariationalELBO, full-batch at the UCI
    config (batch_size 5000 >= N), early stopper with patience measured in
    accumulated-learning-rate units (reference ``early_stopper.py:4-24``),
    log-spaced LR grid with best-by-final-loss selection (reference
    ``runners.py:449-542``).

Both trainers get IDENTICAL inputs (splits, averaged ARD kernel, inducing
points, noise/mean initialisation) produced by the same harness path the UCI
sweep uses. The committed record of the comparison is
``results/audit_svgp.md``.

Run:
    python experiments/audit_svgp.py --datasets boston,energy_cooling,wine_quality \
        --seeds 0,1,2 --config_path experiments/uci/regression/config_precond_map.yaml
"""

from __future__ import annotations

import argparse
import math
import os
import pickle

import numpy as np
import yaml


def _setup(dataset_name: str, seed: int, cfg: dict, outputs_path: str):
    """The UCI main's data -> kernel -> inducing-points pipeline, cached
    under the audit outputs dir (same train-or-load keying as the sweep)."""
    import jax.numpy as jnp

    from experiments.constructors import (
        construct_average_ard_kernel,
        construct_average_gaussian_likelihood_from_models,
        construct_average_mean_constant,
    )
    from experiments.data import ExperimentData, ProblemType
    from experiments.runners import exact_gp_runner, inducing_points_runner
    from experiments.uci.regression.main import get_experiment_data
    from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
        ConditionalVarianceInducingPointSelector,
    )
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    data_path = os.path.join(outputs_path, str(seed), "data", dataset_name)
    models_path = os.path.join(outputs_path, str(seed), "models", dataset_name)
    plots_path = os.path.join(outputs_path, str(seed), "plots", dataset_name)
    for p in (data_path, models_path, plots_path):
        os.makedirs(p, exist_ok=True)

    experiment_data_path = os.path.join(data_path, "experiment_data.pkl")
    if os.path.exists(experiment_data_path):
        experiment_data = ExperimentData.load(
            path=experiment_data_path, problem_type=ProblemType.REGRESSION
        )
    else:
        experiment_data = get_experiment_data(
            seed=seed,
            train_data_percentage=cfg["data"]["train_data_percentage"],
            validation_data_percentage=cfg["data"]["validation_data_percentage"],
            dataset_name=dataset_name,
        )
        experiment_data.save(experiment_data_path)

    kernel_config = cfg["kernel"]
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
        kernels=[m.kernel for m in subsample_gp_models]
    )
    likelihood = construct_average_gaussian_likelihood_from_models(subsample_gp_models)
    mean_constant = construct_average_mean_constant(subsample_gp_models)

    inducing_points_path = os.path.join(data_path, "inducing_points.pkl")
    if os.path.exists(inducing_points_path):
        with open(inducing_points_path, "rb") as f:
            inducing_points = pickle.load(f)
    else:
        ip_cfg = cfg["inducing_points"]
        inducing_points = inducing_points_runner(
            seed=ip_cfg["seed"],
            inducing_point_selector=ConditionalVarianceInducingPointSelector(),
            data=experiment_data.train,
            number_induce_points=int(
                ip_cfg["inducing_points_factor"]
                * math.pow(
                    experiment_data.train.x.shape[0],
                    1 / ip_cfg["inducing_points_power"],
                )
            ),
            kernel=average_ard_kernel,
        )
        with open(inducing_points_path, "wb") as f:
            pickle.dump(inducing_points, f)

    pls_kernel = PLSKernel(
        base_kernel=average_ard_kernel, approximation_samples=inducing_points.x
    )
    return (
        experiment_data,
        inducing_points,
        pls_kernel,
        float(likelihood.noise),
        float(mean_constant),
    )


# ---------------------------------------------------------------------------
# Faithful torch SVGP (the gpytorch protocol, re-created like bench_reference)
# ---------------------------------------------------------------------------
def train_torch_svgp(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_induce: np.ndarray,
    lengthscales: np.ndarray,
    outputscale: float,
    noise_init: float,
    mean_init: float,
    number_of_epochs: int,
    batch_size: int,
    learning_rate: float,
    early_stopper_patience: float,
    seed: int,
):
    """One LR candidate: SGD on the per-point negative ELBO. Returns
    (params dict or None, losses)."""
    import torch

    torch.manual_seed(seed)
    dtype = torch.float64
    x = torch.as_tensor(x_train, dtype=dtype)
    y = torch.as_tensor(y_train, dtype=dtype)
    z = torch.as_tensor(x_induce, dtype=dtype)
    ls = torch.as_tensor(lengthscales, dtype=dtype)
    n, m = x.shape[0], z.shape[0]

    def ard(x1, x2):
        a, b = x1 / ls, x2 / ls
        d2 = (a.square().sum(-1)[:, None] + b.square().sum(-1)[None, :]
              - 2.0 * a @ b.T).clamp_min(0.0)
        return outputscale * torch.exp(-0.5 * d2)

    def r_kernel(x1, x2):
        return ard(x1, z) @ ard(z, x2.reshape(-1, z.shape[1])).T / m

    k_zz = r_kernel(z, z)
    # gpytorch psd_safe_cholesky jitter ladder starts at 1e-8 in fp64
    chol = torch.linalg.cholesky(k_zz + 1e-8 * torch.eye(m, dtype=dtype))
    k_xx_diag = ard(x, z).square().sum(-1) / m  # r(x,x) diag = |k(x,Z)|^2/M

    # parameters: whitened variational mean/chol, raw noise (softplus,
    # GreaterThan(1e-4) like gpytorch), constant mean
    v_mean = torch.zeros(m, dtype=dtype, requires_grad=True)
    v_chol = torch.eye(m, dtype=dtype).requires_grad_(True)
    inv_softplus = math.log(math.expm1(max(noise_init - 1e-4, 1e-12)))
    raw_noise = torch.tensor(inv_softplus, dtype=dtype, requires_grad=True)
    mean_c = torch.tensor(mean_init, dtype=dtype, requires_grad=True)

    opt = torch.optim.SGD([v_mean, v_chol, raw_noise, mean_c], lr=learning_rate)

    k_xz = ard(x, z) @ ard(z, z).T / m  # r(x, Z)
    a_full = torch.linalg.solve_triangular(chol, k_xz.T, upper=False).T  # (N, M)

    def neg_elbo():
        noise = torch.nn.functional.softplus(raw_noise) + 1e-4
        c = torch.tril(v_chol)
        mean_f = mean_c + a_full @ v_mean
        ac = a_full @ c
        var_f = (k_xx_diag - a_full.square().sum(-1) + ac.square().sum(-1)).clamp_min(0.0)
        ell = (-0.5 * math.log(2 * math.pi) - 0.5 * noise.log()
               - 0.5 * (y - mean_f).square() / noise - 0.5 * var_f / noise)
        diag = c.diagonal()
        kl = 0.5 * (c.square().sum() + v_mean @ v_mean - m
                    - 2.0 * diag.abs().log().sum())
        return -(ell.sum() - kl) / n

    losses = []
    min_loss, sim_time = float("inf"), 0.0
    for _ in range(number_of_epochs):
        opt.zero_grad()
        loss = neg_elbo()
        loss.backward()
        opt.step()
        loss_val = float(neg_elbo().detach())
        if not math.isfinite(loss_val):
            return None, None
        if loss_val < min_loss:
            min_loss, sim_time = loss_val, 0.0
        else:
            sim_time += learning_rate
            if sim_time >= early_stopper_patience:
                break
        losses.append(loss_val)

    noise = float(torch.nn.functional.softplus(raw_noise).detach()) + 1e-4
    with torch.no_grad():
        params = {
            "v_mean": v_mean.detach().numpy(),
            "v_chol": torch.tril(v_chol).detach().numpy(),
            "noise": noise,
            "mean_constant": float(mean_c.detach()),
            "chol_kzz": chol.numpy(),
        }
    return params, losses


def torch_svgp_metrics(params, x_eval, y_eval, x_induce, lengthscales,
                       outputscale):
    """Predictive test metrics for the torch SVGP — the harness's Gaussian
    marginal-NLL convention (metrics.py::calculate_nll)."""
    import torch

    dtype = torch.float64
    x = torch.as_tensor(np.asarray(x_eval), dtype=dtype)
    y = torch.as_tensor(np.asarray(y_eval), dtype=dtype)
    z = torch.as_tensor(np.asarray(x_induce), dtype=dtype)
    ls = torch.as_tensor(np.asarray(lengthscales), dtype=dtype)
    m = z.shape[0]

    def ard(x1, x2):
        a, b = x1 / ls, x2 / ls
        d2 = (a.square().sum(-1)[:, None] + b.square().sum(-1)[None, :]
              - 2.0 * a @ b.T).clamp_min(0.0)
        return outputscale * torch.exp(-0.5 * d2)

    k_xz = ard(x, z) @ ard(z, z).T / m
    k_diag = ard(x, z).square().sum(-1) / m
    chol = torch.as_tensor(params["chol_kzz"], dtype=dtype)
    a = torch.linalg.solve_triangular(chol, k_xz.T, upper=False).T
    v_mean = torch.as_tensor(params["v_mean"], dtype=dtype)
    c = torch.as_tensor(params["v_chol"], dtype=dtype)
    mean = params["mean_constant"] + a @ v_mean
    var = (k_diag - a.square().sum(-1) + (a @ c).square().sum(-1)).clamp_min(0.0)
    total_var = var + params["noise"]
    nll = float((0.5 * math.log(2 * math.pi) + 0.5 * total_var.log()
                 + 0.5 * (y - mean).square() / total_var).mean())
    mse = float((y - mean).square().mean())
    return nll, mse


def jax_svgp_metrics(svgp, x_eval, y_eval):
    from experiments.metrics import calculate_mse, calculate_nll

    pred = svgp.predict_y(x_eval)
    return calculate_nll(pred, y_eval), calculate_mse(pred, y_eval)


def run_audit(dataset_names, seeds, cfg, outputs_path):
    from experiments.runners import train_svgp_runner
    from projected_langevin_sampling_tpu.models.gaussian_process import (
        GaussianLikelihood,
    )

    import jax.numpy as jnp

    svgp_cfg = cfg["svgp"]
    rows = []
    for dataset_name in dataset_names:
        for seed in seeds:
            experiment_data, inducing_points, pls_kernel, noise0, mean0 = _setup(
                dataset_name, seed, cfg, outputs_path
            )
            # --- JAX SVGP through the sweep's own runner (fixed trainer).
            # When pointed at the sweep's outputs tree, its already-trained
            # svgp.pkl is the exact model under audit — load it instead of
            # retraining.
            sweep_ckpt = os.path.join(
                outputs_path, str(seed), "models", dataset_name, "svgp.pkl"
            )
            if os.path.exists(sweep_ckpt):
                from experiments.loaders import load_svgp
                from projected_langevin_sampling_tpu.models.gaussian_process import (
                    GaussianLikelihood as _GL,
                )

                svgp, _, _ = load_svgp(
                    sweep_ckpt, likelihood=_GL(noise=jnp.asarray(noise0))
                )
            else:
                svgp, _losses, _best_lr = train_svgp_runner(
                    model_name="svgp",
                    experiment_data=experiment_data,
                    inducing_points=inducing_points,
                    kernel=pls_kernel,
                    likelihood=GaussianLikelihood(noise=jnp.asarray(noise0)),
                    seed=svgp_cfg["seed"],
                    number_of_epochs=svgp_cfg["number_of_epochs"],
                    batch_size=svgp_cfg["batch_size"],
                    learning_rate_upper=svgp_cfg["learning_rate_upper"],
                    learning_rate_lower=svgp_cfg["learning_rate_lower"],
                    number_of_learning_rate_searches=svgp_cfg[
                        "number_of_learning_rate_searches"
                    ],
                    is_fixed=True,
                    observation_noise=noise0,
                    mean_constant=mean0,
                    early_stopper_patience=svgp_cfg["early_stopper_patience"],
                    models_path=os.path.join(
                        outputs_path, str(seed), "models", dataset_name, "svgp-audit"
                    ),
                )
            jax_nll, jax_mse = jax_svgp_metrics(
                svgp, experiment_data.test.x, experiment_data.test.y
            )
            jax_noise = float(svgp.likelihood.noise)

            # --- torch SVGP, reference LR-search protocol
            base = pls_kernel.base_kernel
            lr_grid = np.logspace(
                math.log10(svgp_cfg["learning_rate_lower"]),
                math.log10(svgp_cfg["learning_rate_upper"]),
                svgp_cfg["number_of_learning_rate_searches"],
            )
            best_loss, best_params = float("inf"), None
            for lr in lr_grid:
                params, losses_t = train_torch_svgp(
                    x_train=np.asarray(experiment_data.train.x),
                    y_train=np.asarray(experiment_data.train.y),
                    x_induce=np.asarray(inducing_points.x),
                    lengthscales=np.asarray(base.lengthscales),
                    outputscale=float(base.outputscale),
                    noise_init=noise0,
                    mean_init=mean0,
                    number_of_epochs=svgp_cfg["number_of_epochs"],
                    batch_size=svgp_cfg["batch_size"],
                    learning_rate=float(lr),
                    early_stopper_patience=svgp_cfg["early_stopper_patience"],
                    seed=svgp_cfg["seed"],
                )
                if params is None or not losses_t:
                    continue
                if losses_t[-1] < best_loss:
                    best_loss, best_params = losses_t[-1], params
            torch_nll, torch_mse = torch_svgp_metrics(
                best_params,
                experiment_data.test.x,
                experiment_data.test.y,
                np.asarray(inducing_points.x),
                np.asarray(base.lengthscales),
                float(base.outputscale),
            )
            rows.append(
                dict(
                    dataset=dataset_name,
                    seed=seed,
                    noise_init=noise0,
                    jax_nll=jax_nll,
                    torch_nll=torch_nll,
                    jax_mse=jax_mse,
                    torch_mse=torch_mse,
                    jax_noise=jax_noise,
                    torch_noise=best_params["noise"],
                )
            )
            print(
                f"[audit] {dataset_name} seed={seed}: "
                f"jax nll={jax_nll:.4f} torch nll={torch_nll:.4f} | "
                f"jax mse={jax_mse:.4f} torch mse={torch_mse:.4f} | "
                f"noise init={noise0:.4f} jax={jax_noise:.4f} "
                f"torch={best_params['noise']:.4f}",
                flush=True,
            )
    return rows


def write_report(rows, path):
    lines = [
        "# SVGP regression-baseline audit (round 4)",
        "",
        "Fixed trainer (`learn_observation_noise=True`, matching reference",
        "`experiments/trainers.py:79-95` where the likelihood noise is always in",
        "the SGD parameter set) vs a faithful fp64 torch re-implementation of the",
        "gpytorch SVGP protocol, identical inputs (splits, averaged ARD kernel,",
        "inducing points, noise/mean init). Test split. Generated by",
        "`experiments/audit_svgp.py`.",
        "",
        "| dataset | seed | noise init | jax NLL | torch NLL | jax MSE | torch MSE | jax noise | torch noise |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['dataset']} | {r['seed']} | {r['noise_init']:.4f} "
            f"| {r['jax_nll']:.4f} | {r['torch_nll']:.4f} "
            f"| {r['jax_mse']:.4f} | {r['torch_mse']:.4f} "
            f"| {r['jax_noise']:.4f} | {r['torch_noise']:.4f} |"
        )
    deltas = [r["jax_nll"] - r["torch_nll"] for r in rows]
    lines += [
        "",
        f"Mean NLL delta (jax - torch): {np.mean(deltas):+.4f} "
        f"(max |delta| {np.max(np.abs(deltas)):.4f} over {len(rows)} runs).",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", type=str,
                        default="boston,energy_cooling,wine_quality")
    parser.add_argument("--seeds", type=str, default="0,1,2")
    parser.add_argument(
        "--config_path", type=str,
        default="experiments/uci/regression/config_precond_map.yaml",
    )
    parser.add_argument("--out", type=str, default="results/audit_svgp.md")
    parser.add_argument(
        "--outputs_dirname", type=str, default="outputs_audit_svgp",
        help="outputs tree under experiments/uci/regression — point at the "
        "sweep's own tree (e.g. outputs_precond_map) to reuse its cached "
        "experiment data / subsample GPs / inducing points",
    )
    args = parser.parse_args()

    with open(args.config_path) as f:
        cfg = yaml.safe_load(f)
    outputs_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)),
        "uci", "regression", args.outputs_dirname,
    )
    rows = run_audit(
        dataset_names=args.datasets.split(","),
        seeds=[int(s) for s in args.seeds.split(",")],
        cfg=cfg,
        outputs_path=outputs_path,
    )
    write_report(rows, args.out)
