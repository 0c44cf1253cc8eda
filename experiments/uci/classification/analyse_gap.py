"""Post-hoc attribution of the headline classification NLL gaps (VERDICT #4).

For each dataset with a significant headline PLS-vs-SVGP test-NLL loss, load
the headline sweep's saved artifacts (splits, subsample-GP kernels, trained
particles, SVGP checkpoint — `outputs_precond_smooth/<seed>/...`) and measure
WHERE the per-point NLL gap comes from:

  * per-point decomposition — is the delta a few tail points or uniform?
  * Monte-Carlo noise — spread of the PLS test NLL over predictive-noise keys
    (the J=100 particle predictive is a finite-sample estimate; SVGP's
    Gauss-Hermite marginals are deterministic);
  * confidence/calibration — mean |p-1/2| and a validation-fit logistic
    recalibration (p -> sigmoid(a*logit(p)+b)) applied to BOTH models: if the
    validation-tuned map closes the PLS test gap but not SVGP's, the cause is
    predictive (mis)calibration, not the posterior location;
  * latent moments — mean/variance of the PLS untransformed predictive vs the
    SVGP latent at the test points (under-dispersion shows up here).

Writes a markdown report to results/gap_attribution.md.

VALIDATION GATE (load-path hazard, results/checkpoint_basis_audit.md): for
old-format checkpoints the probe rebuilds the ONB basis, and the eigh rebuild
only reproduces the train-time basis on the training backend+dtype — probing
TPU-trained checkpoints from CPU scrambles the particle coordinates and
fabricates an "over-dispersion" signal. Every row therefore records the
committed sweep's test NLL for the same (dataset, seed) and a `validated`
flag (recomputed-vs-committed match for BOTH models); downstream consumers
(make_results_summary.loss_attribution_section) must drop unvalidated rows.
Run with PLST_PLATFORM=<backend of the sweep> (the headline trained on the
TPU; new basis-carrying checkpoints validate from any backend).

Usage: [PLST_PLATFORM=cpu] python experiments/uci/classification/analyse_gap.py \
          [--datasets wine_uci breast_wdbc] [--seeds 0 1 ... 9]

Reference protocol being probed: /root/reference/experiments/uci/
classification/main.py:190-193 (PLS Bernoulli-sigmoid vs SVGP).
"""

from __future__ import annotations

import argparse
import math
import os
import pickle
import sys

import jax

# default to CPU (predict-only probes must not grab the chip from a running
# sweep); set PLST_PLATFORM to probe on the backend that trained the
# checkpoints — required for old-format (basis-less) checkpoints
jax.config.update("jax_platforms", os.environ.get("PLST_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np
import yaml

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, ROOT)

from experiments.data import ExperimentData, ProblemType
from experiments.loaders import load_pls, load_svgp
from experiments.metrics import calculate_nll
from experiments.runners import dirichlet_exact_gp_runner
from experiments.constructors import construct_average_ard_kernel
from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import BernoulliCost
from projected_langevin_sampling_tpu.models.costs.smoothed_bernoulli import (
    make_smoothed_bernoulli_cost,
    residual_smoothing_std,
)
from projected_langevin_sampling_tpu.models.gaussian_process import BernoulliLikelihood
from projected_langevin_sampling_tpu.models.link_functions import SigmoidLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def _load_models(base: str, dataset: str, seed: int, config: dict):
    """Replicates uci/classification/main.py's LOAD path (no training)."""
    data_path = os.path.join(base, str(seed), "data", dataset)
    models_path = os.path.join(base, str(seed), "models", dataset)
    experiment_data = ExperimentData.load(
        path=os.path.join(data_path, "experiment_data.pkl"),
        problem_type=ProblemType.CLASSIFICATION,
    )
    with open(os.path.join(data_path, "inducing_points.pkl"), "rb") as f:
        inducing_points = pickle.load(f)
    kernel_config = config["kernel"]
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
        model_path=os.path.join(models_path, "subsample_gp"),
        data_path=os.path.join(data_path, "subsample_gp"),
    )
    average_ard_kernel = construct_average_ard_kernel(
        kernels=[m.kernel for m in subsample_gp_models]
    )
    pls_config = config["pls"]
    pls_kernel = PLSKernel(
        base_kernel=average_ard_kernel, approximation_samples=inducing_points.x
    )
    onb_basis = build_orthonormal_basis(
        kernel=pls_kernel,
        x_induce=inducing_points.x,
        x_train=experiment_data.train.x,
        scaling=pls_config.get("onb_scaling", "reference"),
        relative_eigenvalue_threshold=pls_config.get(
            "onb_relative_eigenvalue_threshold"
        ),
    )
    cost = BernoulliCost(
        y_train=experiment_data.train.y, link_function=SigmoidLinkFunction()
    )
    if pls_config.get("cost_smoothing") == "residual":
        cost = make_smoothed_bernoulli_cost(
            y_train=experiment_data.train.y,
            smoothing_std=residual_smoothing_std(
                onb_basis, average_ard_kernel(experiment_data.train.x, diag=True)
            ),
        )
    pls = PLS(basis=onb_basis, cost=cost, name="pls-onb")
    # load_pls restores the checkpointed MAP mean constant onto pls.basis
    particles, _, best_lr, n_epochs = load_pls(
        os.path.join(models_path, "pls-onb.pkl"), pls=pls
    )
    svgp, _, _ = load_svgp(
        os.path.join(models_path, "svgp.pkl"), likelihood=BernoulliLikelihood()
    )
    return experiment_data, pls, particles, svgp, best_lr, n_epochs


def _logit(p: np.ndarray) -> np.ndarray:
    # float64 BEFORE clipping: in float32, 1 - 1e-12 rounds back to 1.0 and
    # log1p(-p) produces -inf
    p = np.clip(np.asarray(p, dtype=np.float64), 1e-12, 1 - 1e-12)
    return np.log(p) - np.log1p(-p)


def _nll(p: np.ndarray, y: np.ndarray) -> float:
    p = np.clip(np.asarray(p, dtype=np.float64), 1e-12, 1 - 1e-12)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log1p(-p)))


def _recalibrate(p_val, y_val, p_tgt):
    """Validation-fit logistic recalibration p -> sigmoid(a*logit(p)+b); grid
    search (the 2-D NLL landscape is smooth and tiny)."""
    zv = _logit(np.asarray(p_val))
    best = (1.0, 0.0, _nll(np.asarray(p_val), np.asarray(y_val)))
    for a in np.geomspace(0.25, 4.0, 33):
        for b in np.linspace(-1.0, 1.0, 21):
            q = 1 / (1 + np.exp(-(a * zv + b)))
            n = _nll(q, np.asarray(y_val))
            if n < best[2]:
                best = (float(a), float(b), n)
    a, b, _ = best
    zt = _logit(np.asarray(p_tgt))
    return 1 / (1 + np.exp(-(a * zt + b))), a, b


_TEMPER_GRID = np.sort(np.append(np.geomspace(0.05, 3.0, 61), 1.0))
_GH32_X, _GH32_W = np.polynomial.hermite.hermgauss(32)


def _temper_pls(f_val, y_val, f_test, y_test):
    """Validation-fit LATENT SPREAD temper for the particle predictive — the
    classification analogue of the reference temper layer (ref
    ``src/temper/base.py``: scale the predictive variance by a scalar fit on
    the calibration NLL). Each latent sample is contracted toward the
    per-point particle mean, f_j -> f_bar + s (f_j - f_bar), with s chosen
    on validation; s=1 is in the grid so tempering never loses on the
    calibration split. Unlike ``_recalibrate`` (a probability-space
    transform), this targets ONLY dispersion: if tempering closes a gap the
    gap was excess latent spread and nothing else."""

    def nll_at(f, y, s):
        fm = f.mean(axis=1, keepdims=True)
        p = 1.0 / (1.0 + np.exp(-(fm + s * (f - fm))))
        return _nll(p.mean(axis=1), y)

    s_best = min(_TEMPER_GRID, key=lambda s: nll_at(f_val, y_val, s))
    return nll_at(f_test, y_test, s_best), float(s_best)


def _temper_svgp(mu_v, var_v, y_v, mu_t, var_t, y_t):
    """Same spread temper for the SVGP latent Gaussian: q(f) = N(mu, s^2
    sigma^2), predictive via 32-node Gauss-Hermite."""

    def nll_at(mu, var, y, s):
        z = mu[:, None] + np.sqrt(2.0 * np.maximum(var, 1e-12))[:, None] * s * _GH32_X[None, :]
        p = (1.0 / (1.0 + np.exp(-z)) * _GH32_W[None, :]).sum(axis=1) / np.sqrt(np.pi)
        return _nll(p, y)

    s_best = min(_TEMPER_GRID, key=lambda s: nll_at(mu_v, var_v, y_v, s))
    return nll_at(mu_t, var_t, y_t, s_best), float(s_best)


def analyse(base: str, dataset: str, seed: int, config: dict) -> tuple[dict, dict]:
    """Returns (probe row, resave context) — the context carries what
    ``--resave`` needs to upgrade a VALIDATED old-format checkpoint to the
    basis-carrying format (experiments/loaders.save_pls)."""
    experiment_data, pls, particles, svgp, best_lr, n_epochs = _load_models(
        base, dataset, seed, config
    )
    test, val = experiment_data.test, experiment_data.validation
    y = np.asarray(test.y, dtype=float)

    pls_probs = np.asarray(pls(x=test.x, particles=particles, key=0).probs)
    svgp_probs = np.asarray(svgp.predict_y(test.x).probs)
    pls_nll, svgp_nll = _nll(pls_probs, y), _nll(svgp_probs, y)

    # MC spread of the particle predictive over predictive-noise keys
    mc = [
        _nll(np.asarray(pls(x=test.x, particles=particles, key=k).probs), y)
        for k in range(1, 6)
    ]

    # per-point decomposition: share of the total delta carried by the
    # worst 5% of test points (tail-driven vs uniform gap)
    pp = np.clip(np.asarray(pls_probs, dtype=np.float64), 1e-12, 1 - 1e-12)
    ps = np.clip(np.asarray(svgp_probs, dtype=np.float64), 1e-12, 1 - 1e-12)
    lp_p = y * np.log(pp) + (1 - y) * np.log1p(-pp)
    lp_s = y * np.log(ps) + (1 - y) * np.log1p(-ps)
    d = lp_s - lp_p  # >0 where SVGP beats PLS
    k = max(1, int(0.05 * len(d)))
    tail_share = float(np.sort(d)[-k:].sum() / d.sum()) if d.sum() > 0 else float("nan")

    # validation-fit recalibration applied to BOTH models
    out = {
        "dataset": dataset,
        "seed": seed,
        "n_test": len(y),
        "pls_nll": pls_nll,
        "svgp_nll": svgp_nll,
        "delta": pls_nll - svgp_nll,
        "pls_mc_std": float(np.std(mc + [pls_nll])),
        "tail_share_5pct": tail_share,
        "pls_conf": float(np.mean(np.abs(pls_probs - 0.5))),
        "svgp_conf": float(np.mean(np.abs(svgp_probs - 0.5))),
    }
    if val is not None and val.x is not None and len(np.asarray(val.y)) >= 10:
        yv = np.asarray(val.y, dtype=float)
        pv = np.asarray(pls(x=val.x, particles=particles, key=0).probs)
        sv = np.asarray(svgp.predict_y(val.x).probs)
        p_cal, a_p, b_p = _recalibrate(pv, yv, pls_probs)
        s_cal, a_s, b_s = _recalibrate(sv, yv, svgp_probs)
        out.update(
            pls_nll_recal=_nll(p_cal, y),
            svgp_nll_recal=_nll(s_cal, y),
            pls_recal_a=a_p,
            pls_recal_b=b_p,
            svgp_recal_a=a_s,
            svgp_recal_b=b_s,
        )

    # latent moments at the test points: PLS untransformed predictive vs the
    # SVGP latent — under-dispersion of the particle cloud shows up here
    f_samples = np.asarray(
        pls.predict_untransformed_samples(particles=particles, x=test.x, key=0)
    )
    q_f = svgp.latent(test.x)
    mu_s, var_s = q_f.mean, q_f.variance
    # decomposition: zero injected noise -> variance of the pure particle
    # projection k(x,Z) Vt U (the posterior component); the remainder of the
    # total latent variance is the injected prior-residual noise
    m_k = pls.basis.approximation_dimension
    n_test, j = np.asarray(test.x).shape[0], f_samples.shape[1]
    f_proj = np.asarray(
        pls.predict_untransformed_samples(
            particles=particles, x=test.x, noise=jnp.zeros((m_k + n_test, j))
        )
    )
    proj_var = float(np.mean(np.var(f_proj, axis=1)))
    total_var = float(np.mean(np.var(f_samples, axis=1)))
    out.update(
        pls_latent_var=total_var,
        pls_proj_var=proj_var,
        pls_noise_var=total_var - proj_var,
        svgp_latent_var=float(np.mean(np.asarray(var_s))),
        latent_mean_gap=float(
            np.mean(np.abs(np.mean(f_samples, axis=1) - np.asarray(mu_s)))
        ),
    )

    # spread-temper probe (both models, validation-fit): contracts ONLY the
    # latent dispersion. pls_nll_temper ~= svgp_nll_temper says the entire
    # residual gap is the particle cloud's excess spread (what the temper
    # layer removes); a surviving tempered gap would point at the mean field
    if val is not None and val.x is not None and len(np.asarray(val.y)) >= 10:
        yv = np.asarray(val.y, dtype=float)
        f_val = np.asarray(
            pls.predict_untransformed_samples(particles=particles, x=val.x, key=0)
        )
        pls_t, s_p = _temper_pls(f_val, yv, f_samples, y)
        q_v = svgp.latent(val.x)
        svgp_t, s_s = _temper_svgp(
            np.asarray(q_v.mean), np.asarray(q_v.variance), yv,
            np.asarray(mu_s), np.asarray(var_s), y,
        )
        out.update(
            pls_nll_temper=pls_t,
            pls_temper_s=s_p,
            svgp_nll_temper=svgp_t,
            svgp_temper_s=s_s,
        )

    # continued-sampling probe: extend the chain from the checkpoint at its
    # winning step size — if the spread contracts and the NLL drops, the gap
    # was under-convergence (sampler artifact); if both are stable, the
    # particle cloud is at its stationary law and the gap is the posterior
    # family itself
    if best_lr is not None:
        from projected_langevin_sampling_tpu.training import train_pls

        extra = int(np.clip(n_epochs or 1000, 1000, 200_000))
        p2, _ = train_pls(
            pls,
            particles,
            extra,
            float(best_lr),
            key=123,
            fast_path=config["pls"].get("fast_path", "auto"),
            discretisation=config["pls"].get("discretisation", "euler"),
        )
        out["pls_nll_extended"] = _nll(
            np.asarray(pls(x=test.x, particles=p2, key=0).probs), y
        )
        f2 = np.asarray(
            pls.predict_untransformed_samples(
                particles=p2, x=test.x, noise=jnp.zeros((m_k + n_test, j))
            )
        )
        out["pls_proj_var_extended"] = float(np.mean(np.var(f2, axis=1)))
        out["extra_steps"] = extra
    resave_ctx = {
        "path": os.path.join(base, str(seed), "models", dataset, "pls-onb.pkl"),
        "pls": pls,
        "particles": particles,
        "best_lr": best_lr,
        "n_epochs": n_epochs,
    }
    return out, resave_ctx


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="*", default=["wine_uci", "breast_wdbc"])
    parser.add_argument("--seeds", nargs="*", type=int, default=list(range(10)))
    parser.add_argument(
        "--outputs_dirname", default="outputs_precond_smooth",
    )
    parser.add_argument("--report", default=os.path.join(ROOT, "results", "gap_attribution.md"))
    parser.add_argument(
        "--tolerance",
        type=float,
        default=1e-3,
        help="validation-gate tolerance in nats. The default catches the "
        "cross-backend basis scramble (errors ~2.4 nats) with a huge "
        "margin; probing CHIP-trained checkpoints from the CPU backend "
        "needs ~0.02 — the recomputed predictive differs by the TPU-vs-CPU "
        "matmul path (bf16 MXU operands) at the ~MC-noise level, far below "
        "the failure mode the gate exists for",
    )
    parser.add_argument(
        "--resave",
        action="store_true",
        help="upgrade each VALIDATED old-format checkpoint to the basis-"
        "carrying format (loaders.save_pls) so later probes are backend-"
        "independent; only touched when the validation gate passes",
    )
    args = parser.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(here, args.outputs_dirname)
    with open(os.path.join(here, "config_precond_smooth.yaml")) as f:
        config = yaml.safe_load(f)

    import pandas as pd

    # committed sweep record for the validation gate (see module docstring):
    # a probe row only counts if its recomputed NLLs match what the sweep
    # itself recorded at train time for the same checkpoint
    committed = pd.read_csv(os.path.join(ROOT, "results", "uci_metrics_long.csv"))
    committed = committed[
        (committed["protocol"] == args.outputs_dirname)
        & (committed["metric"] == "nll")
        & (committed["split"] == "test")
    ]

    def _committed_nll(dataset: str, seed: int, model: str) -> float:
        sub = committed[
            (committed["dataset"] == dataset)
            & (committed["seed"] == seed)
            & (committed["model"] == model)
        ]
        return float(sub["value"].iloc[0]) if len(sub) else float("nan")

    csv_path = os.path.splitext(args.report)[0] + ".csv"
    # merge-never-clobber: the probe is invoked incrementally (the round-4
    # queue probes each (dataset, seed) right after its headline regen, on
    # the sweep's backend) — keep previously probed rows, replacing only
    # same-(dataset, seed) ones. Pre-gate rows (no `validated` column) are
    # dropped: downstream consumers ignore them anyway.
    prior = None
    if os.path.exists(csv_path):
        prior = pd.read_csv(csv_path)
        if "validated" not in prior.columns:
            prior = None

    def _merged(rows: list[dict]) -> "pd.DataFrame":
        fresh = pd.DataFrame(rows)
        if prior is None or prior.empty:
            return fresh
        probed = set(zip(fresh["dataset"], fresh["seed"]))
        keep = prior[
            ~prior.apply(lambda r: (r["dataset"], r["seed"]) in probed, axis=1)
        ]
        return pd.concat([keep, fresh], ignore_index=True).sort_values(
            ["dataset", "seed"]
        )

    rows = []
    for dataset in args.datasets:
        for seed in args.seeds:
            try:
                r, resave_ctx = analyse(base, dataset, seed, config)
            except FileNotFoundError as e:
                print(f"skip {dataset}/{seed}: {e}")
                continue
            r["pls_nll_committed"] = _committed_nll(dataset, seed, "pls-onb")
            r["svgp_nll_committed"] = _committed_nll(dataset, seed, "svgp")
            tol = args.tolerance  # recompute matches the sweep to ~1e-7 when
            # the basis matches; a scrambled basis misses by whole nats
            r["validated"] = bool(
                abs(r["pls_nll"] - r["pls_nll_committed"]) <= tol
                and abs(r["svgp_nll"] - r["svgp_nll_committed"]) <= tol
            )
            if not r["validated"]:
                print(
                    f"  [validate] {dataset}/{seed} FAILED: probe pls "
                    f"{r['pls_nll']:.4f} vs committed "
                    f"{r['pls_nll_committed']:.4f}, svgp {r['svgp_nll']:.4f} "
                    f"vs {r['svgp_nll_committed']:.4f} — basis mismatch or "
                    f"stale checkpoint; row excluded downstream",
                    flush=True,
                )
            if args.resave and r["validated"]:
                with open(resave_ctx["path"], "rb") as f:
                    payload = pickle.load(f)
                if payload.get("basis") is None:
                    from experiments.loaders import save_pls

                    save_pls(
                        path=resave_ctx["path"],
                        particles=resave_ctx["particles"],
                        observation_noise=payload.get("observation_noise"),
                        best_lr=resave_ctx["best_lr"],
                        number_of_epochs=resave_ctx["n_epochs"],
                        mean_constant=payload.get("mean_constant"),
                        basis=resave_ctx["pls"].basis,
                    )
                    print(
                        f"  [resave] {resave_ctx['path']} upgraded to the "
                        "basis-carrying format (validated frame)",
                        flush=True,
                    )
            rows.append(r)
            # incremental dump: an interrupted run keeps every finished seed
            # (the CSV is the clean-clone source for the RESULTS.md mechanism
            # paragraph — make_results_summary.loss_attribution_section)
            _merged(rows).to_csv(csv_path, index=False)
            print(
                f"{dataset}/{seed}: pls={r['pls_nll']:.4f} svgp={r['svgp_nll']:.4f} "
                f"mc_std={r['pls_mc_std']:.4f} recal={r.get('pls_nll_recal', float('nan')):.4f} "
                f"latent_var pls/svgp={r['pls_latent_var']:.3f}/{r['svgp_latent_var']:.3f} "
                f"(proj {r['pls_proj_var']:.3f} + noise {r['pls_noise_var']:.3f}) "
                f"ext_nll={r.get('pls_nll_extended', float('nan')):.4f} "
                f"ext_proj_var={r.get('pls_proj_var_extended', float('nan')):.3f}",
                flush=True,
            )

    if not rows:
        print("no artifacts found")
        return
    df = _merged(rows)
    lines = [
        "# Headline classification NLL gap — post-hoc attribution\n",
        "Per-seed probes on the headline sweep's saved artifacts"
        " (`outputs_precond_smooth`; identical splits/kernels/SVGP as the"
        " RESULTS.md head-to-head). Columns: `mc_std` = std of the PLS test"
        " NLL over 6 predictive-noise keys (Monte-Carlo component);"
        " `recal` = test NLL after validation-fit logistic recalibration"
        " (applied to both models); `tail5%` = share of the summed per-point"
        " delta carried by the worst 5% of test points; `latent var` = mean"
        " predictive variance of the PLS untransformed samples vs the SVGP"
        " latent.\n",
    ]
    for dataset, sub in df.groupby("dataset"):
        lines.append(f"## {dataset}\n")
        cols = [
            "seed", "pls_nll", "svgp_nll", "delta", "pls_mc_std",
            "pls_nll_recal", "svgp_nll_recal", "tail_share_5pct",
            "pls_conf", "svgp_conf", "pls_latent_var", "pls_proj_var",
            "pls_noise_var", "svgp_latent_var", "pls_nll_extended",
            "pls_proj_var_extended", "pls_nll_temper", "pls_temper_s",
            "svgp_nll_temper", "svgp_temper_s",
        ]
        cols = [c for c in cols if c in sub.columns]
        lines.append(sub[cols].round(4).to_markdown(index=False))
        lines.append("")
        mean = sub.mean(numeric_only=True)
        summary = (
            f"Means over {len(sub)} seeds: delta {mean['delta']:+.4f}; "
            f"MC std {mean['pls_mc_std']:.4f}"
        )
        if "pls_nll_recal" in sub.columns:
            summary += (
                f"; recalibrated delta "
                f"{mean['pls_nll_recal'] - mean['svgp_nll_recal']:+.4f}"
            )
        if "pls_nll_temper" in sub.columns:
            ts = sub.dropna(subset=["pls_nll_temper", "svgp_nll_temper"])
            if len(ts):
                tmean = ts.mean(numeric_only=True)
                summary += (
                    f"; spread-tempered delta "
                    f"{tmean['pls_nll_temper'] - tmean['svgp_nll_temper']:+.4f}"
                    f" over {len(ts)} probed seeds"
                    f" (s_pls={tmean['pls_temper_s']:.2f},"
                    f" s_svgp={tmean['svgp_temper_s']:.2f})"
                )
        summary += (
            f"; latent var pls/svgp = "
            f"{mean['pls_latent_var']:.3f}/{mean['svgp_latent_var']:.3f}."
        )
        lines.append(summary + "\n")
    with open(args.report, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
