"""Smoke tests: every plotter renders and writes a file without error."""

import os

import jax.numpy as jnp
import matplotlib
import numpy as np

matplotlib.use("Agg")

from experiments.data import Data, ExperimentData, ProblemType
from experiments.plotters import (
    animate_1d_pls_predictions,
    plot_1d_conformal_prediction,
    plot_1d_experiment_data,
    plot_1d_gp_prediction,
    plot_1d_pls_prediction,
    plot_1d_pls_prediction_histogram,
    plot_eigenvalues,
    plot_energy_potentials,
    plot_losses,
    plot_true_versus_predicted,
)
from projected_langevin_sampling_tpu.models.conformalise.base import ConformalPrediction
from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal

N = 30


def _experiment_data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    return ExperimentData(
        name="t", problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=x[::2], y=y[::2], name="train"),
        test=Data(x=x[1::2], y=y[1::2], name="test"),
    )


def test_all_plotters_write_files(tmp_path):
    ed = _experiment_data()
    x = ed.full.x
    samples = jnp.asarray(np.random.default_rng(1).normal(size=(N, 8)))
    mvn = MultivariateNormal(mean=ed.full.y, variance=0.1 * jnp.ones(N))
    conf = ConformalPrediction(
        coverage=0.95, mean=ed.full.y, lower=ed.full.y - 1, upper=ed.full.y + 1
    )

    paths = {
        "data": lambda p: plot_1d_experiment_data(ed, title="d", save_path=p),
        "pls": lambda p: plot_1d_pls_prediction(
            ed, x=x, predicted_samples=samples, predicted_distribution=mvn, save_path=p
        ),
        "pls_conf": lambda p: plot_1d_pls_prediction(
            ed, x=x, predicted_distribution=conf, save_path=p
        ),
        "hist": lambda p: plot_1d_pls_prediction_histogram(
            ed, predicted_samples=samples, save_path=p
        ),
        "losses": lambda p: plot_losses({0.1: [3.0, 2.0, 1.0]}, save_path=p),
        "energy": lambda p: plot_energy_potentials(
            {1e-3: [5.0, 4.0, 3.0], 1e-4: [6.0, np.inf, 1e305]}, save_path=p
        ),
        "tvp": lambda p: plot_true_versus_predicted(
            ed.full.y, mvn, save_path=p, error_bar=True
        ),
        "tvp_conf": lambda p: plot_true_versus_predicted(
            ed.full.y, conf, save_path=p, error_bar=True
        ),
        "gp": lambda p: plot_1d_gp_prediction(
            x, mean=ed.full.y, variance=0.1 * jnp.ones(N),
            experiment_data=ed, save_path=p,
        ),
    }
    for name, fn in paths.items():
        p = os.path.join(tmp_path, f"{name}.png")
        fn(p)
        assert os.path.exists(p) and os.path.getsize(p) > 0, name


class _StubConformal:
    def predict(self, x, coverage):
        y = jnp.zeros(x.shape[0])
        return ConformalPrediction(coverage=coverage, mean=y, lower=y - 1, upper=y + 1)


def test_data_particle_and_non_parametric_plotters(tmp_path):
    """The three 1-D building-block plotters (reference plotters.py:80,127,224):
    standalone save AND composition onto a shared axes."""
    import matplotlib.pyplot as plt

    from experiments.plotters import (
        plot_1d_data,
        plot_1d_non_parametric_prediction,
        plot_1d_particle,
    )

    ed = _experiment_data()
    samples = np.random.default_rng(2).normal(size=(N, 8))
    lower, upper = np.quantile(samples, [0.025, 0.975], axis=1)

    p1 = tmp_path / "data.png"
    assert plot_1d_data(ed.train, title="t", save_path=str(p1)) is None
    assert p1.exists() and p1.stat().st_size > 0

    p2 = tmp_path / "npp.png"
    out = plot_1d_non_parametric_prediction(
        ed.full.x, mean=samples.mean(axis=1), lower=lower, upper=upper,
        coverage=0.95, save_path=str(p2),
    )
    assert out is None and p2.exists() and p2.stat().st_size > 0

    # composition: all three share one axes, particle labels appear once
    fig, ax = plt.subplots()
    plot_1d_data(ed.train, ax=ax)
    for j in range(samples.shape[1]):
        plot_1d_particle(ax, ed.full.x, samples[:, j], add_label=(j == 0))
    plot_1d_non_parametric_prediction(
        ed.full.x, samples.mean(axis=1), lower, upper, ax=ax
    )
    handles, labels = ax.get_legend_handles_labels()
    assert labels.count("particle") == 1
    p3 = tmp_path / "composed.png"
    fig.savefig(p3)
    plt.close(fig)
    assert p3.exists() and p3.stat().st_size > 0


def test_conformal_plotter(tmp_path):
    ed = _experiment_data()
    p = os.path.join(tmp_path, "conf.png")
    plot_1d_conformal_prediction(_StubConformal(), ed, save_path=p)
    assert os.path.exists(p)


def test_animation_writes_gif(tmp_path):
    ed = _experiment_data()
    rng = np.random.default_rng(2)
    snapshots = [(i, jnp.asarray(rng.normal(size=(5, 6)))) for i in range(3)]

    def predict_fn(particles):
        return jnp.asarray(rng.normal(size=(N, 6)))

    p = os.path.join(tmp_path, "anim.gif")
    animate_1d_pls_predictions(
        ed, x=ed.full.x, snapshots=snapshots, predict_fn=predict_fn,
        title="t", save_path=p, fps=2,
    )
    assert os.path.exists(p) and os.path.getsize(p) > 0
