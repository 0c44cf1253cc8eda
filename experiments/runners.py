"""High-level orchestration (reference ``experiments/runners.py``):
inducing-point selection, subsample-GP kernel learning, the log-spaced
step-size search for PLS, the log-spaced learning-rate search for SVGP, and
the plotting runners.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.neighbors import NearestNeighbors

from experiments.data import Data, ExperimentData
from experiments.loaders import (
    load_ard_exact_gp_model,
    load_svgp,
    save_ard_exact_gp_model,
    save_svgp,
)
from experiments.metrics import (
    calculate_acc,
    calculate_auc,
    calculate_f1,
    calculate_mae,
    calculate_mse,
    calculate_nll,
)
from experiments.trainers import train_exact_gp, train_pls, train_svgp
from experiments.utils import create_directory
from projected_langevin_sampling_tpu.models.conformalise import ConformalisePLS
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    InducingPointSelector,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.temper import TemperPLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel

Array = jax.Array


def dirichlet_exact_gp_runner(
    experiment_data: ExperimentData,
    kernel: ARDKernel,
    subsample_size: int,
    seed: int,
    number_of_epochs: int,
    learning_rate: float,
    number_of_iterations: int,
    early_stopper_patience: float,
    model_path: str,
    data_path: str,
    plot_loss_path: str | None = None,
) -> list:
    """Classification kernel learning (reference
    ``uci/classification/main.py:133-160``): Dirichlet-transform the labels
    (gpytorch ``DirichletClassificationLikelihood``), fit the subsample GPs
    per class on the transformed logit-scale targets with the per-point fixed
    noise, and return ALL models (classes x iterations) for kernel averaging.
    Fitting on raw 0/1 labels instead learns an outputscale ~100x too small —
    the prior then cannot move the sigmoid off 0.5."""
    from projected_langevin_sampling_tpu.models.gaussian_process.dirichlet import (
        dirichlet_classification_targets,
    )

    targets, noise_variances, num_classes = dirichlet_classification_targets(
        experiment_data.train.y
    )
    models = []
    for c in range(num_classes):
        experiment_data_c = ExperimentData(
            name=experiment_data.name,
            problem_type=experiment_data.problem_type,
            full=experiment_data.full,
            train=Data(x=experiment_data.train.x, y=targets[c], name="train"),
            test=experiment_data.test,
            validation=experiment_data.validation,
        )
        models.extend(
            exact_gp_runner(
                experiment_data=experiment_data_c,
                kernel=kernel,
                subsample_size=subsample_size,
                seed=seed,
                number_of_epochs=number_of_epochs,
                learning_rate=learning_rate,
                number_of_iterations=number_of_iterations,
                early_stopper_patience=early_stopper_patience,
                model_path=os.path.join(model_path, f"class_{c}"),
                data_path=os.path.join(data_path, f"class_{c}"),
                plot_loss_path=plot_loss_path,
                fixed_noise_variances=noise_variances[c],
            )
        )
    return models


def inducing_points_runner(
    seed: int,
    inducing_point_selector: InducingPointSelector,
    data: Data,
    number_induce_points: int,
    kernel: ARDKernel,
) -> Data:
    """Select inducing points + their labels (reference ``runners.py:37-63``)."""
    x = np.asarray(data.x).reshape(data.x.shape[0], -1)
    x_induce, induce_indices = inducing_point_selector(
        x=jnp.asarray(x),
        m=number_induce_points,
        kernel=kernel,
        rng=np.random.default_rng(seed),
    )
    idx = np.asarray(induce_indices)
    return Data(
        x=x_induce,
        y=None if data.y is None else jnp.asarray(np.asarray(data.y)[idx]),
        y_untransformed=(
            None
            if data.y_untransformed is None
            else jnp.asarray(np.asarray(data.y_untransformed)[idx])
        ),
        name="induce",
    )


def subsample_data_indices(
    x, subsample_size: int, seed: int | None = None
):
    """kNN neighbourhood subsample indices around a random point
    (reference ``runners.py:66-85``); None = take everything."""
    x = np.asarray(x)
    if subsample_size > len(x):
        return None
    rng = np.random.default_rng(seed)
    knn = NearestNeighbors(n_neighbors=subsample_size, p=2)
    knn.fit(X=x)
    centre = x[rng.integers(x.shape[0])][None, :]
    return knn.kneighbors(X=centre, return_distance=False).flatten()


def load_subsample_data(data: Data, subsample_size: int, seed: int | None = None) -> Data:
    """kNN neighbourhood subsample around a random point
    (reference ``runners.py:66-85``)."""
    idx = subsample_data_indices(data.x, subsample_size, seed)
    if idx is None:
        return data
    return Data(
        x=jnp.asarray(np.asarray(data.x)[idx]),
        y=jnp.asarray(np.asarray(data.y)[idx]),
    )


def exact_gp_runner(
    experiment_data: ExperimentData,
    kernel: ARDKernel,
    subsample_size: int,
    seed: int,
    number_of_epochs: int,
    learning_rate: float,
    number_of_iterations: int,
    early_stopper_patience: float,
    model_path: str,
    data_path: str,
    plot_1d_subsample_path: str | None = None,
    plot_loss_path: str | None = None,
    fixed_noise_variances=None,
) -> list:
    """Train-or-load k subsample exact GPs (reference ``runners.py:88-187``).

    ``fixed_noise_variances``: per-train-point noise (N,), subsampled with
    the same kNN indices as (x, y) — the Dirichlet classification case."""
    from experiments.plotters import plot_1d_gp_prediction_and_inducing_points, plot_losses

    create_directory(model_path)
    create_directory(data_path)
    models = []
    losses_history = {}
    if subsample_size >= len(experiment_data.train.x):
        number_of_iterations = 1
        model_name = "full_exact_gp"
    else:
        model_name = "subsample_exact_gp"
    for i in range(number_of_iterations):
        ckpt = os.path.join(
            model_path, f"{model_name}_{i + 1}_of_{number_of_iterations}.pkl"
        )
        if os.path.exists(ckpt):
            model, losses = load_ard_exact_gp_model(ckpt)
        else:
            idx = subsample_data_indices(
                experiment_data.train.x, subsample_size, seed=seed + i
            )
            if idx is None:
                data = experiment_data.train
                fixed_i = fixed_noise_variances
            else:
                data = Data(
                    x=jnp.asarray(np.asarray(experiment_data.train.x)[idx]),
                    y=jnp.asarray(np.asarray(experiment_data.train.y)[idx]),
                )
                fixed_i = (
                    None
                    if fixed_noise_variances is None
                    else jnp.asarray(np.asarray(fixed_noise_variances)[idx])
                )
            model, losses = train_exact_gp(
                data=data,
                kernel=kernel,
                seed=seed + i,
                number_of_epochs=number_of_epochs,
                learning_rate=learning_rate,
                early_stopper_patience=early_stopper_patience,
                model_name=model_name,
                fixed_noise_variances=fixed_i,
            )
            save_ard_exact_gp_model(ckpt, model, losses)
            if plot_1d_subsample_path is not None:
                create_directory(plot_1d_subsample_path)
                plot_1d_gp_prediction_and_inducing_points(
                    model=model,
                    experiment_data=experiment_data,
                    title=f"Subsample GP (iteration {i + 1}, {subsample_size=})",
                    save_path=os.path.join(
                        plot_1d_subsample_path, f"gp-subsample-iteration-{i + 1}.png"
                    ),
                )
        losses_history[float(i)] = losses
        models.append(model)
    if plot_loss_path is not None:
        create_directory(plot_loss_path)
        plot_losses(
            losses_history=losses_history,
            title=f"Subsample GP Learning ({subsample_size=})",
            save_path=os.path.join(plot_loss_path, "subsample-gp-losses.png"),
        )
    return models


def train_pls_runner(
    pls: PLS,
    particle_name: str,
    experiment_data: ExperimentData,
    simulation_duration: float,
    maximum_number_of_steps: int,
    early_stopper_patience: float,
    number_of_step_searches: int,
    step_size_upper: float,
    minimum_change_in_energy_potential: float,
    seed: int,
    particles: Array,
    plot_title: str | None = None,
    plot_energy_potential_path: str | None = None,
    metric_to_optimise: str = "nll",
    fast_path: str = "auto",
    discretisation: str = "euler",
    parallel: dict | None = None,
    equilibrate_spread: float | None = None,
) -> tuple[Array, float | None, int]:
    """Log-spaced step-size search (reference ``runners.py:331-446``): each
    candidate runs for simulation_duration/step_size epochs from the SAME
    initial particles; the best by the train-split metric wins; break early
    when the final energy stops moving between consecutive candidates.

    ``equilibrate_spread`` (framework extension, default off = reference
    semantics): the reference's search stops on an ENERGY plateau, but the
    energy is mean-dominated — at the break point the particle SPREAD can
    still be contracting, leaving the predictive over-dispersed (hypothesis
    for the headline classification NLL losses; measured directly by the
    ``outputs_precond_smooth_eq`` attribution column — the original probe
    evidence was invalidated by the checkpoint-basis bug,
    ``results/checkpoint_basis_audit.md``). With a float threshold (e.g. 0.01),
    the WINNING chain continues in chunks of its own length at its selected
    step size until the mean per-coordinate particle variance changes by
    less than that relative factor between chunks (capped at
    ``maximum_number_of_steps`` total extra epochs, 16 chunks). Much
    cheaper than lengthening ``simulation_duration`` for every candidate;
    the selected step size and the search itself are untouched."""
    if metric_to_optimise in ["nll", "mse", "mae", "loss"]:
        best_metric_value = float("inf")
    elif metric_to_optimise in ["acc", "auc", "f1"]:
        best_metric_value = 0.0
    else:
        raise NotImplementedError(f"Unknown metric to optimise {metric_to_optimise}.")
    best_lr = None
    energy_potentials_history: dict[float, list[float]] = {}
    step_sizes = np.logspace(
        np.log10(step_size_upper),
        np.log10(simulation_duration / maximum_number_of_steps),
        number_of_step_searches,
    )
    particles_out = particles
    initial_energy = float(pls.calculate_energy_potential(particles))
    for i, step_size in enumerate(step_sizes):
        number_of_epochs = int(simulation_duration / step_size)
        particles_i, energy_potentials = train_pls(
            pls=pls,
            particles=particles,
            number_of_epochs=number_of_epochs,
            step_size=float(step_size),
            early_stopper_patience=early_stopper_patience,
            seed=seed,
            fast_path=fast_path,
            discretisation=discretisation,
            parallel=parallel,
            tqdm_desc=(
                f"PLS Step Size Search {i + 1} of {number_of_step_searches} "
                f"for {particle_name} ({step_size=})"
            ),
        )
        # The reference keeps any candidate with finite particles
        # (``runners.py:373``) — in float64 a diverged trajectory overflows to
        # inf within a few steps, so isfinite alone catches it. An
        # edge-of-stability step size, however, grows slowly enough to stay
        # finite-but-astronomical for the whole run (and with a short patience
        # it can stop after ONE recorded energy); additionally require the run
        # to have IMPROVED on the initial particles' energy at some point —
        # same intent as the reference's check, robust to slow divergence
        # (e.g. curves 1/10 at the stock config select such a candidate).
        # both the best AND the final energy must improve on doing nothing
        # (a run can dip early and then slowly blow up before the stopper
        # fires — its final particles are garbage even though it "improved")
        diverged = bool(energy_potentials) and not (
            min(energy_potentials) <= initial_energy
            and energy_potentials[-1] <= initial_energy
        )
        print(
            f"  [search {particle_name}] eta={float(step_size):.3e} "
            f"epochs={number_of_epochs} recorded={len(energy_potentials)} "
            f"E0={initial_energy:.4g} "
            f"min={min(energy_potentials) if energy_potentials else float('nan'):.4g} "
            f"last={energy_potentials[-1] if energy_potentials else float('nan'):.4g} "
            f"diverged={diverged} "
            f"finite={bool(jnp.isfinite(particles_i).all())}",
            flush=True,
        )
        if energy_potentials and not diverged and bool(jnp.isfinite(particles_i).all()):
            energy_potentials_history[float(step_size)] = energy_potentials
            prediction = pls.predict(
                x=experiment_data.train.x, particles=particles_i, key=0
            )
            y_train = experiment_data.train.y
            if metric_to_optimise == "nll":
                metric_value = calculate_nll(prediction=prediction, y=y_train)
            elif metric_to_optimise == "mse":
                metric_value = calculate_mse(prediction=prediction, y=y_train)
            elif metric_to_optimise == "mae":
                metric_value = calculate_mae(prediction=prediction, y=y_train)
            elif metric_to_optimise == "acc":
                metric_value = calculate_acc(prediction.probs, y_train)
            elif metric_to_optimise == "auc":
                metric_value = calculate_auc(prediction.probs, y_train)
            elif metric_to_optimise == "f1":
                metric_value = calculate_f1(prediction.probs, y_train)
            elif metric_to_optimise == "loss":
                metric_value = energy_potentials[-1]
            if (
                metric_to_optimise in ["nll", "mse", "mae", "loss"]
                and metric_value < best_metric_value
            ) or (
                metric_to_optimise in ["acc", "auc", "f1"]
                and metric_value > best_metric_value
            ):
                best_metric_value = metric_value
                best_lr = float(step_size)
                particles_out = particles_i
            prev = float(step_sizes[i - 1]) if i > 0 else None
            # Relative-change denominator uses |prev| with a floor — the
            # reference divides by the RAW previous energy
            # (reference runners.py:424-433), which breaks the search after
            # two candidates whenever energies go negative (the mixture
            # likelihood keeps its Gaussian log-normalisation, so well-fit
            # energies are ~ -0.69*N) and ZeroDivisionErrors on exactly 0.
            # Documented deviation, PARITY.md.
            if (
                prev is not None
                and prev in energy_potentials_history
                and abs(
                    energy_potentials_history[prev][-1] - energy_potentials[-1]
                )
                / max(abs(energy_potentials_history[prev][-1]), 1e-30)
                < minimum_change_in_energy_potential
            ):
                break
    if energy_potentials_history and plot_energy_potential_path is not None:
        from experiments.plotters import plot_energy_potentials

        create_directory(plot_energy_potential_path)
        plot_energy_potentials(
            energy_potentials_history=energy_potentials_history,
            title=f"{plot_title} (energy potentials)" if plot_title else None,
            save_path=os.path.join(
                plot_energy_potential_path, f"energy-potential-{particle_name}.png"
            ),
        )
    best_epochs = (
        len(energy_potentials_history[best_lr]) if best_lr is not None else 0
    )
    if equilibrate_spread is not None and best_lr is not None and best_epochs > 0:
        particles_out, best_epochs = _equilibrate_spread_phase(
            pls=pls,
            particles=particles_out,
            step_size=best_lr,
            chunk_epochs=best_epochs,
            threshold=float(equilibrate_spread),
            max_total_epochs=int(maximum_number_of_steps),
            early_stopper_patience=early_stopper_patience,
            seed=seed,
            fast_path=fast_path,
            discretisation=discretisation,
            parallel=parallel,
            particle_name=particle_name,
        )
    return particles_out, best_lr, best_epochs


def _equilibrate_spread_phase(
    pls,
    particles: Array,
    step_size: float,
    chunk_epochs: int,
    threshold: float,
    max_total_epochs: int,
    early_stopper_patience: float,
    seed: int,
    fast_path: str,
    discretisation: str,
    parallel: dict | None,
    particle_name: str,
    max_chunks: int = 16,
) -> tuple[Array, int]:
    """Continue the winning chain until the particle spread plateaus (see
    ``train_pls_runner``'s ``equilibrate_spread``). Each chunk keeps the
    candidate discipline of the search: non-finite particles or an energy
    above the chunk's starting energy discard the chunk and stop."""

    def spread(p: Array) -> float:
        return float(jnp.mean(jnp.var(p, axis=1)))

    total = chunk_epochs
    s_prev = spread(particles)
    e_prev = float(pls.calculate_energy_potential(particles))
    for chunk in range(max_chunks):
        if total + chunk_epochs > max_total_epochs:
            break
        p_new, energies = train_pls(
            pls=pls,
            particles=particles,
            number_of_epochs=chunk_epochs,
            step_size=float(step_size),
            early_stopper_patience=early_stopper_patience,
            seed=seed + 7919 * (chunk + 1),  # deterministic, distinct per chunk
            fast_path=fast_path,
            discretisation=discretisation,
            parallel=parallel,
        )
        if not (
            energies
            and bool(jnp.isfinite(p_new).all())
            and energies[-1] <= e_prev + 1e-3 * abs(e_prev) + 1e-9
        ):
            print(
                f"  [equilibrate {particle_name}] chunk {chunk}: discarded "
                f"(non-finite or energy rose) — stopping",
                flush=True,
            )
            break
        s_new = spread(p_new)
        rel = abs(s_new - s_prev) / max(abs(s_prev), 1e-30)
        total += len(energies)
        particles, s_prev, e_prev = p_new, s_new, energies[-1]
        print(
            f"  [equilibrate {particle_name}] chunk {chunk}: +{len(energies)} "
            f"epochs (total {total}), spread={s_new:.5g} (rel change {rel:.3g}), "
            f"E={e_prev:.6g}",
            flush=True,
        )
        if rel < threshold:
            break
    return particles, total


def train_svgp_runner(
    model_name: str,
    experiment_data: ExperimentData,
    inducing_points: Data,
    kernel: ARDKernel,
    likelihood,
    seed: int,
    number_of_epochs: int,
    batch_size: int,
    learning_rate_upper: float,
    learning_rate_lower: float,
    number_of_learning_rate_searches: int,
    is_fixed: bool,
    models_path: str,
    early_stopper_patience: float,
    observation_noise: float | None = None,
    mean_constant: float = 0.0,
    plot_title: str | None = None,
    plot_loss_path: str | None = None,
    load_model: bool = True,
):
    """Log-spaced learning-rate search for SVGP (reference ``runners.py:449-542``).
    Returns (model, losses, best_learning_rate)."""
    create_directory(models_path)
    best_loss = float("inf")
    losses_history = {}
    model_out, losses_out, best_learning_rate = None, None, None
    for i, learning_rate in enumerate(
        np.logspace(
            math.log10(learning_rate_lower),
            math.log10(learning_rate_upper),
            number_of_learning_rate_searches,
        )
    ):
        ckpt = os.path.join(
            models_path, f"svgp_{i + 1}_of_{number_of_learning_rate_searches}.pkl"
        )
        if os.path.exists(ckpt) and load_model:
            model, losses, _ = load_svgp(ckpt, likelihood)
        else:
            model, losses = train_svgp(
                train_data=experiment_data.train,
                inducing_points=inducing_points,
                kernel=kernel,
                likelihood=likelihood,
                seed=seed,
                number_of_epochs=number_of_epochs,
                batch_size=batch_size,
                learning_rate=float(learning_rate),
                learn_inducing_locations=not is_fixed,
                learn_kernel_parameters=not is_fixed,
                early_stopper_patience=early_stopper_patience,
                likelihood_noise=observation_noise,
                mean_constant=mean_constant,
            )
            if model is None:
                print(
                    f"  [search {model_name}] lr={learning_rate:.3e} "
                    "diverged (non-finite parameters)",
                    flush=True,
                )
                continue
            # checkpoint records the CANDIDATE's own rate (best_learning_rate
            # is still None on the first candidate and stale on later ones)
            save_svgp(ckpt, model, losses, float(learning_rate))
        if not losses:
            continue
        print(
            f"  [search {model_name}] lr={learning_rate:.3e} "
            f"epochs={len(losses)} loss0={losses[0]:.4g} lossN={losses[-1]:.4g}",
            flush=True,
        )
        losses_history[float(learning_rate)] = losses
        loss = losses[-1]
        if loss < best_loss:
            best_loss = loss
            best_learning_rate = float(learning_rate)
            model_out = model
            losses_out = losses
    if plot_loss_path is not None:
        from experiments.plotters import plot_losses

        create_directory(plot_loss_path)
        plot_losses(
            losses_history=losses_history,
            title=f"{plot_title} loss ({model_name})" if plot_title else None,
            save_path=os.path.join(plot_loss_path, f"{model_name}-losses.png"),
        )
    return model_out, losses_out, best_learning_rate


def plot_pls_1d_particles_runner(
    pls,
    particles: Array,
    particle_name: str,
    experiment_data: ExperimentData,
    plot_particles_path: str,
    inducing_points: Data | None = None,
    coverage: float = 0.95,
    plot_title: str | None = None,
    number_of_particles_to_plot: int | None = None,
    christmas_colours: bool = False,
) -> None:
    """Prediction/particle plots for PLS or its calibrated wrappers
    (reference ``runners.py:190-328``)."""
    from experiments.plotters import (
        plot_1d_pls_prediction,
        plot_1d_pls_prediction_histogram,
    )

    create_directory(plot_particles_path)
    x_full = experiment_data.full.x
    if isinstance(pls, PLS):
        predicted_distribution = pls.predict(x=x_full, particles=particles, key=0)
    elif isinstance(pls, ConformalisePLS):
        predicted_distribution = pls.predict(x=x_full, coverage=coverage)
    elif isinstance(pls, TemperPLS):
        predicted_distribution = pls.predict(x=x_full)
    else:
        raise TypeError(f"Unknown PLS type: {type(pls)}")

    predicted_samples = None
    if isinstance(pls, PLS):
        subset = (
            particles[:, :number_of_particles_to_plot]
            if number_of_particles_to_plot is not None
            else particles
        )
        predicted_samples = pls.predict_samples(x=x_full, particles=subset, key=1)

    plot_1d_pls_prediction(
        experiment_data=experiment_data,
        inducing_points=inducing_points,
        x=x_full,
        predicted_samples=predicted_samples,
        predicted_distribution=predicted_distribution,
        coverage=coverage,
        title=plot_title,
        save_path=os.path.join(plot_particles_path, f"particles-{particle_name}.png"),
        christmas_colours=christmas_colours,
    )
    if experiment_data.full.y_untransformed is not None and isinstance(pls, PLS):
        subset = (
            particles[:, :number_of_particles_to_plot]
            if number_of_particles_to_plot is not None
            else particles
        )
        untransformed = pls.predict_untransformed_samples(
            x=x_full, particles=subset, key=2
        )
        plot_1d_pls_prediction(
            experiment_data=experiment_data,
            x=x_full,
            predicted_samples=untransformed,
            y_name="$f(x)$",
            title=f"{plot_title}: $f(x)$" if plot_title else None,
            save_path=os.path.join(
                plot_particles_path, f"untransformed-particles-{particle_name}.png"
            ),
            is_sample_untransformed=True,
        )
        if predicted_samples is not None:
            plot_1d_pls_prediction_histogram(
                experiment_data=experiment_data,
                predicted_samples=predicted_samples,
                untransformed_predicted_samples=untransformed,
                title=plot_title,
                save_path=os.path.join(
                    plot_particles_path, f"histogram-{particle_name}.png"
                ),
            )


def animate_pls_1d_particles_runner(
    pls: PLS,
    particles: Array,
    particle_name: str,
    experiment_data: ExperimentData,
    animate_1d_path: str,
    step_size: float,
    number_of_epochs: int,
    seed: int,
    number_of_frames: int = 40,
    christmas_colours: bool = False,
    animate_1d_untransformed_path: str | None = None,
    fast_path: str = "auto",
) -> None:
    """GIF of the particle evolution (reference ``runners.py`` animate
    runners + ``plotters.py:656-990``): record snapshots along ONE run."""
    from experiments.plotters import animate_1d_pls_predictions

    create_directory(animate_1d_path)
    chunk = max(number_of_epochs // number_of_frames, 1)
    snapshots = [(0, particles)]
    current = particles
    for frame in range(number_of_frames):
        current, _ = train_pls(
            pls=pls,
            particles=current,
            number_of_epochs=chunk,
            step_size=step_size,
            early_stopper_patience=float("inf"),
            seed=seed + frame,
            fast_path=fast_path,
        )
        snapshots.append(((frame + 1) * chunk, current))

    noise = pls.sample_predictive_noise(
        particles=current, x=experiment_data.full.x, key=0
    )
    obs_noise = pls.sample_observation_noise(particles.shape[1], key=1)

    def predict_fn(p):
        return pls.predict_samples(
            particles=p,
            x=experiment_data.full.x,
            predictive_noise=noise,
            observation_noise=obs_noise,
        )

    animate_1d_pls_predictions(
        experiment_data=experiment_data,
        x=experiment_data.full.x,
        snapshots=snapshots,
        predict_fn=predict_fn,
        title=f"PLS particles ({particle_name})",
        save_path=os.path.join(animate_1d_path, f"pls-{particle_name}.gif"),
        christmas_colours=christmas_colours,
    )
    if animate_1d_untransformed_path is not None:
        create_directory(animate_1d_untransformed_path)

        def predict_untransformed_fn(p):
            return pls.predict_untransformed_samples(
                particles=p, x=experiment_data.full.x, noise=noise
            )

        animate_1d_pls_predictions(
            experiment_data=experiment_data,
            x=experiment_data.full.x,
            snapshots=snapshots,
            predict_fn=predict_untransformed_fn,
            title=f"PLS untransformed ({particle_name})",
            save_path=os.path.join(
                animate_1d_untransformed_path, f"pls-untransformed-{particle_name}.gif"
            ),
            christmas_colours=christmas_colours,
        )
