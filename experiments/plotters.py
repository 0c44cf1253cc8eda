"""Matplotlib diagnostics (reference ``experiments/plotters.py``, 16 plot
functions + 3 GIF animators).

Same plot vocabulary, leaner implementation. The reference's animators re-run
training once per frame (``plotters.py:656-1148``); here animations consume
particle snapshots recorded along ONE training run (the scan already returns
them cheaply), which renders the same evolution at a fraction of the compute.
"""

from __future__ import annotations

import os

import matplotlib.animation
import matplotlib.pyplot as plt
import numpy as np

from experiments.data import Data, ExperimentData
from projected_langevin_sampling_tpu.models.conformalise.base import ConformalPrediction
from projected_langevin_sampling_tpu.models.distributions import (
    Bernoulli,
    MultivariateNormal,
    Poisson,
    StudentTMarginals,
)

_CHRISTMAS = ["#d42426", "#1d7f38", "#f8b229", "#dbe9ee"]  # plotters.py:710 easter egg


def _sorted_1d(x):
    x = np.asarray(x).reshape(len(x), -1)[:, 0]
    order = np.argsort(x)
    return x, order


def plot_1d_experiment_data(
    experiment_data: ExperimentData, title: str | None = None, save_path: str | None = None
):
    fig, ax = plt.subplots(figsize=(9, 4.5))
    for data, color, marker in [
        (experiment_data.train, "tab:blue", "o"),
        (experiment_data.test, "tab:orange", "x"),
        (experiment_data.validation, "tab:green", "^"),
    ]:
        if data is None or data.y is None:
            continue
        ax.scatter(np.asarray(data.x)[:, 0], np.asarray(data.y), s=8, c=color,
                   marker=marker, label=data.name, alpha=0.6)
    ax.legend()
    if title:
        ax.set_title(title)
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")
    return _finish(fig, save_path)


def _finish(fig, save_path):
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return fig


def plot_1d_data(
    data: Data,
    title: str | None = None,
    save_path: str | None = None,
    color: str = "tab:blue",
    alpha: float = 0.3,
    s: int = 10,
    ax=None,
):
    """Scatter one labelled split (reference ``plotters.py:127``
    plot_1d_data). Pass ``ax`` to compose onto an existing figure (the
    reference threads fig/ax through every call); standalone use creates and
    finishes its own figure like the rest of this module."""
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=(9, 4.5))
    if data.y is not None:
        ax.scatter(
            np.asarray(data.x)[:, 0], np.asarray(data.y),
            label=data.name, alpha=alpha, color=color, s=s,
        )
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")
    if title:
        ax.set_title(title)
    if fig is None:
        return ax
    ax.legend(loc="best", fontsize=8)
    return _finish(fig, save_path)


def plot_1d_particle(ax, x, y, add_label: bool = False, alpha: float = 0.2):
    """One particle's predicted function as a faint black trace (reference
    ``plotters.py:224`` plot_1d_particle): composes onto the caller's axes;
    ``add_label`` labels only the first trace so the legend shows a single
    'particle' entry for the whole fan."""
    x_plot, order = _sorted_1d(x)
    ax.plot(
        x_plot[order], np.asarray(y).reshape(-1)[order],
        color="black", alpha=alpha, zorder=0,
        label="particle" if add_label else None,
    )
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")
    return ax


def plot_1d_non_parametric_prediction(
    x,
    mean,
    lower,
    upper,
    coverage: float = 0.95,
    title: str | None = None,
    save_path: str | None = None,
    ax=None,
):
    """Mean line + sample-quantile coverage band for predictives with no
    parametric envelope (reference ``plotters.py:80``
    plot_1d_non_parametric_prediction): grey band between the empirical
    lower/upper quantiles, black mean line."""
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=(9, 4.5))
    x_plot, order = _sorted_1d(x)
    ax.fill_between(
        x_plot[order],
        np.asarray(lower).reshape(-1)[order],
        np.asarray(upper).reshape(-1)[order],
        facecolor=(0.9, 0.9, 0.9),
        label=f"{coverage * 100:g}% error",
        zorder=0,
    )
    ax.plot(
        x_plot[order], np.asarray(mean).reshape(-1)[order],
        label="mean", zorder=1, color="black", linewidth=0.8,
    )
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")
    if title:
        ax.set_title(title)
    if fig is None:
        return ax
    ax.legend(loc="best", fontsize=8)
    return _finish(fig, save_path)


def plot_1d_pls_prediction(
    experiment_data: ExperimentData,
    x,
    predicted_samples=None,
    predicted_distribution=None,
    inducing_points: Data | None = None,
    coverage: float = 0.95,
    title: str | None = None,
    save_path: str | None = None,
    y_name: str = "$y$",
    is_sample_untransformed: bool = False,
    christmas_colours: bool = False,
):
    """Particle fan + (optionally) the moment-matched predictive envelope
    (reference ``plotters.py`` plot_1d_pls_prediction)."""
    fig, ax = plt.subplots(figsize=(9, 4.5))
    x_plot, order = _sorted_1d(x)
    if predicted_samples is not None:
        samples = np.asarray(predicted_samples)
        colours = _CHRISTMAS if christmas_colours else [plt.cm.viridis(i) for i in
                                                        np.linspace(0, 0.8, max(samples.shape[1], 1))]
        for j in range(samples.shape[1]):
            ax.plot(x_plot[order], samples[order, j], alpha=0.25, linewidth=0.6,
                    color=colours[j % len(colours)])
    if predicted_distribution is not None:
        _plot_distribution_envelope(ax, x_plot, order, predicted_distribution, coverage)
    if experiment_data.train is not None and experiment_data.train.y is not None and not is_sample_untransformed:
        ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                   np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4, label="train")
    if inducing_points is not None:
        ax.scatter(np.asarray(inducing_points.x)[:, 0],
                   np.asarray(inducing_points.y) if inducing_points.y is not None else
                   np.zeros(inducing_points.x.shape[0]),
                   marker="*", s=80, c="tab:red", label="inducing", zorder=5)
    ax.set_xlabel("$x$")
    ax.set_ylabel(y_name)
    if title:
        ax.set_title(title)
    ax.legend(loc="best", fontsize=8)
    return _finish(fig, save_path)


def _plot_distribution_envelope(ax, x_plot, order, dist, coverage):
    import scipy.stats

    if isinstance(dist, MultivariateNormal):
        mean = np.asarray(dist.mean)
        std = np.sqrt(np.asarray(dist.variance))
        z = scipy.stats.norm.interval(coverage)[1]
        ax.plot(x_plot[order], mean[order], c="tab:blue", label="mean")
        ax.fill_between(x_plot[order], (mean - z * std)[order], (mean + z * std)[order],
                        alpha=0.25, color="tab:blue", label=f"{coverage:.0%} interval")
    elif isinstance(dist, ConformalPrediction):
        mean = np.asarray(dist.mean)
        ax.plot(x_plot[order], mean[order], c="tab:blue", label="median")
        ax.fill_between(x_plot[order], np.asarray(dist.lower)[order],
                        np.asarray(dist.upper)[order], alpha=0.25, color="tab:blue",
                        label=f"{dist.coverage:.0%} conformal")
    elif isinstance(dist, Bernoulli):
        ax.plot(x_plot[order], np.asarray(dist.probs)[order], c="tab:blue", label="p(y=1)")
    elif isinstance(dist, Poisson):
        ax.plot(x_plot[order], np.asarray(dist.rate)[order], c="tab:blue", label="rate")
    elif isinstance(dist, StudentTMarginals):
        mean = np.asarray(dist.loc)
        ax.plot(x_plot[order], mean[order], c="tab:blue", label="loc")


def plot_1d_gp_prediction(
    x,
    mean,
    variance,
    experiment_data: ExperimentData | None = None,
    title: str | None = None,
    save_path: str | None = None,
    coverage: float = 0.95,
):
    """Envelope plot from explicit mean/variance arrays (reference
    ``plotters.py`` plot_1d_gp_prediction)."""
    dist = MultivariateNormal(mean=np.asarray(mean), variance=np.asarray(variance))
    fig, ax = plt.subplots(figsize=(9, 4.5))
    x_plot, order = _sorted_1d(x)
    _plot_distribution_envelope(ax, x_plot, order, dist, coverage)
    if experiment_data is not None and experiment_data.train is not None:
        ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                   np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4)
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_1d_conformal_prediction(
    model,
    experiment_data: ExperimentData,
    title: str | None = None,
    save_path: str | None = None,
    coverage: float = 0.95,
):
    """Conformal interval plot over the full input range (reference
    ``plotters.py`` plot_1d_conformal_prediction)."""
    prediction = model.predict(experiment_data.full.x, coverage=coverage)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    x_plot, order = _sorted_1d(experiment_data.full.x)
    _plot_distribution_envelope(ax, x_plot, order, prediction, coverage)
    if experiment_data.train is not None:
        ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                   np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4)
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_1d_gp_prediction_and_inducing_points(
    model,
    experiment_data: ExperimentData,
    inducing_points: Data | None = None,
    title: str | None = None,
    save_path: str | None = None,
    coverage: float = 0.95,
):
    prediction = model.predict_y(experiment_data.full.x)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    x_plot, order = _sorted_1d(experiment_data.full.x)
    _plot_distribution_envelope(ax, x_plot, order, prediction, coverage)
    if experiment_data.train is not None:
        ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                   np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4, label="train")
    if inducing_points is not None:
        ax.scatter(np.asarray(inducing_points.x)[:, 0], np.asarray(inducing_points.y),
                   marker="*", s=80, c="tab:red", label="inducing", zorder=5)
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_1d_pls_prediction_histogram(
    experiment_data: ExperimentData,
    predicted_samples,
    untransformed_predicted_samples=None,
    title: str | None = None,
    save_path: str | None = None,
):
    """Histogram of particle predictions at a representative input."""
    samples = np.asarray(predicted_samples)
    mid = samples.shape[0] // 2
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(samples[mid, :], bins=30, alpha=0.7, label="transformed")
    if untransformed_predicted_samples is not None:
        ax.hist(np.asarray(untransformed_predicted_samples)[mid, :], bins=30,
                alpha=0.5, label="untransformed")
    ax.legend()
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_losses(losses_history: dict, title: str | None = None, save_path: str | None = None):
    fig, ax = plt.subplots(figsize=(7, 4))
    for lr, losses in losses_history.items():
        if losses:
            ax.plot(losses, label=f"lr={lr:.2e}" if isinstance(lr, float) else str(lr))
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend(fontsize=7)
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_energy_potentials(
    energy_potentials_history: dict, title: str | None = None, save_path: str | None = None
):
    """Energy potential vs simulation time per candidate step size
    (reference ``plotters.py:554-589``)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    all_positive = True
    # matplotlib's LogLocator overflows on ranges spanning hundreds of
    # decades (diverged-but-finite candidates) — cap what we display
    display_cap = 1e30
    for step_size, energies in energy_potentials_history.items():
        energies = np.asarray(energies, dtype=float)
        keep = np.isfinite(energies) & (np.abs(energies) < display_cap)
        sim_time = (np.arange(1, len(energies) + 1) * step_size)[keep]
        energies = energies[keep]
        if energies.size == 0:
            continue
        ax.plot(sim_time, energies, label=f"$\\eta$={step_size:.2e}")
        all_positive &= bool(np.all(energies > 0))
    ax.set_xlabel("simulation time")
    ax.set_ylabel("energy potential")
    if all_positive:
        ax.set_yscale("log")
    ax.legend(fontsize=7)
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_eigenvalues(basis, title: str | None = None, save_path: str | None = None):
    """Kernel eigenvalue spectrum (reference ``plotters.py:1149-1162``)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogy(np.asarray(basis.eigenvalues)[::-1], marker="o", markersize=3)
    ax.set_xlabel("index")
    ax.set_ylabel("eigenvalue")
    if title:
        ax.set_title(title)
    return _finish(fig, save_path)


def plot_true_versus_predicted(
    y_true,
    y_pred,
    title: str | None = None,
    save_path: str | None = None,
    coverage: float = 0.95,
    error_bar: bool = False,
):
    import scipy.stats

    from experiments.metrics import _point_estimate

    fig, ax = plt.subplots(figsize=(5, 5))
    y_true = np.asarray(y_true)
    point = np.asarray(_point_estimate(y_pred))
    if error_bar and isinstance(y_pred, MultivariateNormal):
        z = scipy.stats.norm.interval(coverage)[1]
        err = z * np.sqrt(np.clip(np.asarray(y_pred.variance), 0.0, None))
        ax.errorbar(y_true, point, yerr=err, fmt="o", markersize=3, alpha=0.5,
                    elinewidth=0.5)
    elif error_bar and isinstance(y_pred, ConformalPrediction):
        lower = np.asarray(y_pred.lower)
        upper = np.asarray(y_pred.upper)
        # Bounds are clamped to the median, so point-lower / upper-point are
        # >= 0 up to fp rounding; clip the residual negatives matplotlib rejects.
        yerr = [np.clip(point - lower, 0.0, None), np.clip(upper - point, 0.0, None)]
        ax.errorbar(y_true, point, yerr=yerr, fmt="o",
                    markersize=3, alpha=0.5, elinewidth=0.5)
    else:
        ax.scatter(y_true, point, s=8, alpha=0.5)
    lims = [min(y_true.min(), point.min()), max(y_true.max(), point.max())]
    ax.plot(lims, lims, "k--", linewidth=1)
    ax.set_xlabel("true")
    ax.set_ylabel("predicted")
    if title:
        ax.set_title(title, fontsize=8)
    return _finish(fig, save_path)


def animate_1d_pls_predictions(
    experiment_data: ExperimentData,
    x,
    snapshots: list,
    predict_fn,
    title: str | None = None,
    save_path: str | None = None,
    fps: int = 10,
    christmas_colours: bool = False,
):
    """GIF of the particle fan over training (reference ``plotters.py:656-820``
    animators, driven by recorded snapshots instead of per-frame re-training).

    snapshots: list of (step_label, particles); predict_fn(particles) -> (N*, J)
    samples at x.
    """
    x_plot, order = _sorted_1d(x)
    fig, ax = plt.subplots(figsize=(9, 4.5))

    first = np.asarray(predict_fn(snapshots[0][1]))
    colours = _CHRISTMAS if christmas_colours else [
        plt.cm.viridis(i) for i in np.linspace(0, 0.8, max(first.shape[1], 1))
    ]
    lines = [
        ax.plot(x_plot[order], first[order, j], alpha=0.25, linewidth=0.6,
                color=colours[j % len(colours)])[0]
        for j in range(first.shape[1])
    ]
    if experiment_data.train is not None and experiment_data.train.y is not None:
        ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                   np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4)
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")

    def update(frame):
        label, particles = snapshots[frame]
        samples = np.asarray(predict_fn(particles))
        for j, line in enumerate(lines):
            line.set_ydata(samples[order, j])
        ax.set_title(f"{title or ''} (step {label})", fontsize=9)
        return lines

    anim = matplotlib.animation.FuncAnimation(
        fig, update, frames=len(snapshots), blit=False
    )
    if save_path is not None:
        anim.save(save_path, writer=matplotlib.animation.PillowWriter(fps=fps))
        plt.close(fig)
        return None
    return anim


def animate_1d_pls_untransformed_predictions(*args, **kwargs):
    """Same animator on the untransformed samples — pass the untransformed
    predict_fn (reference ``plotters.py:823-990``)."""
    return animate_1d_pls_predictions(*args, **kwargs)


def animate_1d_gp_predictions(
    experiment_data: ExperimentData,
    x,
    snapshots: list,
    title: str | None = None,
    save_path: str | None = None,
    fps: int = 10,
):
    """GIF of a GP predictive envelope over training snapshots
    (reference ``plotters.py:993-1148``). snapshots: list of (label, model)."""
    x_plot, order = _sorted_1d(x)
    fig, ax = plt.subplots(figsize=(9, 4.5))

    def draw(frame):
        ax.clear()
        label, model = snapshots[frame]
        pred = model.predict_y(x)
        _plot_distribution_envelope(ax, x_plot, order, pred, 0.95)
        if experiment_data.train is not None:
            ax.scatter(np.asarray(experiment_data.train.x)[:, 0],
                       np.asarray(experiment_data.train.y), s=8, c="k", alpha=0.4)
        ax.set_title(f"{title or ''} (epoch {label})", fontsize=9)

    anim = matplotlib.animation.FuncAnimation(fig, draw, frames=len(snapshots), blit=False)
    if save_path is not None:
        anim.save(save_path, writer=matplotlib.animation.PillowWriter(fps=fps))
        plt.close(fig)
        return None
    return anim
