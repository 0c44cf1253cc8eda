"""Experiment-harness tests: splits, metrics dispatch, early stopper, data
persistence, runners on tiny problems — the tier the reference leaves
untested (SURVEY.md §4 notes the harness has no tests)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from experiments.curves.curves import CURVE_FUNCTIONS, Curve2
from experiments.data import Data, ExperimentData, ProblemType
from projected_langevin_sampling_tpu.utils.early_stopper import EarlyStopper
from experiments.metrics import (
    calculate_coverage,
    calculate_mae,
    calculate_mse,
    calculate_nll,
)
from experiments.preprocess import (
    set_up_experiment,
    split_regression_data,
    split_regression_data_intervals,
)
from projected_langevin_sampling_tpu.models.conformalise.base import ConformalPrediction
from projected_langevin_sampling_tpu.models.distributions import (
    Bernoulli,
    MultivariateNormal,
    Poisson,
    StudentTMarginals,
)


def test_early_stopper_semantics():
    s = EarlyStopper(patience=0.3)
    assert not s.should_stop(1.0, 0.1)  # improvement resets
    assert not s.should_stop(2.0, 0.1)  # worse: time 0.1
    assert not s.should_stop(2.0, 0.1)  # worse: time 0.2
    assert s.should_stop(2.0, 0.1)  # worse: time 0.3 >= patience
    s2 = EarlyStopper(patience=10.0)
    assert s2.should_stop(float("nan"), 0.1)  # non-finite stops immediately


def test_interval_split_covers_everything_once():
    x = jnp.arange(120, dtype=jnp.float64).reshape(-1, 1)
    y = jnp.arange(120, dtype=jnp.float64)
    x_tr, y_tr, _, x_te, y_te, _ = split_regression_data_intervals(
        split_seed=0, x=x, y=y, number_of_test_intervals=2,
        total_number_of_intervals=12,
    )
    combined = np.sort(np.concatenate([np.asarray(x_tr)[:, 0], np.asarray(x_te)[:, 0]]))
    np.testing.assert_array_equal(combined, np.arange(120))
    # edges always in the test split (reference preprocess.py:22-29)
    assert 0.0 in np.asarray(x_te) and 119.0 in np.asarray(x_te)
    # 2 interior + 4 edge intervals of size 10
    assert x_te.shape[0] == 60


def test_set_up_experiment_normalises_train_targets():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 2)))
    y = jnp.asarray(5.0 + 3.0 * rng.normal(size=100))
    ed = set_up_experiment(
        name="t", problem_type=ProblemType.REGRESSION, seed=0, x=x, y=y,
        train_data_percentage=0.7, validation_data_percentage=0.1,
    )
    assert abs(float(jnp.mean(ed.train.y))) < 1e-9
    assert abs(float(jnp.std(ed.train.y, ddof=1)) - 1.0) < 1e-9
    assert ed.validation is not None
    assert ed.y_std > 1.0
    n_total = ed.train.x.shape[0] + ed.test.x.shape[0] + ed.validation.x.shape[0]
    assert n_total == 100


def test_split_regression_data_proportions():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(200, 1)))
    y = jnp.asarray(rng.normal(size=200))
    x_tr, y_tr, x_te, y_te, x_va, y_va = split_regression_data(
        seed=0, x=x, y=y, train_data_percentage=0.5,
        validation_data_percentage=0.25, test_data_percentage=0.25,
    )
    assert x_tr.shape[0] == 100 and x_te.shape[0] == 50 and x_va.shape[0] == 50


def test_experiment_data_roundtrip(tmp_path):
    ed = ExperimentData(
        name="t",
        problem_type=ProblemType.REGRESSION,
        full=Data(x=jnp.ones((4, 1)), y=jnp.zeros(4), name="full"),
        train=Data(x=jnp.ones((2, 1)), y=jnp.zeros(2), name="train"),
        test=Data(x=jnp.ones((2, 1)), y=jnp.zeros(2), name="test"),
        y_mean=1.5,
        y_std=2.0,
    )
    path = os.path.join(tmp_path, "ed.pkl")
    ed.save(path)
    loaded = ExperimentData.load(path, ProblemType.REGRESSION)
    assert loaded.y_mean == 1.5 and loaded.y_std == 2.0
    np.testing.assert_array_equal(np.asarray(loaded.train.x), np.ones((2, 1)))
    assert loaded.validation is None


def test_metric_dispatch_across_prediction_types():
    y = jnp.asarray([0.0, 1.0, 2.0])
    mvn = MultivariateNormal(mean=y + 0.5, variance=jnp.ones(3))
    assert calculate_mae(mvn, y) == pytest.approx(0.5)
    assert calculate_mse(mvn, y) == pytest.approx(0.25)
    assert np.isfinite(calculate_nll(mvn, y))

    bern = Bernoulli(probs=jnp.asarray([0.2, 0.8, 0.9]))
    y_bin = jnp.asarray([0.0, 1.0, 1.0])
    assert calculate_mae(bern, y_bin) == pytest.approx((0.2 + 0.2 + 0.1) / 3)
    assert np.isfinite(calculate_nll(bern, y_bin))

    pois = Poisson(rate=jnp.asarray([1.0, 2.0, 3.0]))
    assert np.isfinite(calculate_nll(pois, y + 1))

    st = StudentTMarginals(df=4.0, loc=y, scale=jnp.ones(3))
    assert calculate_mse(st, y) == pytest.approx(0.0)

    conf = ConformalPrediction(
        coverage=2 / 3, mean=y, lower=y - 1.0, upper=y + 1.0
    )
    assert calculate_coverage(conf, y) == 1.0
    assert np.isfinite(calculate_nll(conf, y))
    with pytest.raises(AssertionError):
        calculate_nll(
            ConformalPrediction(coverage=0.9, mean=y, lower=y - 1, upper=y + 1), y
        )


def test_curves_standardised_and_reproducible():
    x = jnp.linspace(-3, 3, 200).reshape(-1, 1)
    for curve in CURVE_FUNCTIONS:
        c = curve.calculate_curve(x)
        assert abs(float(jnp.mean(c))) < 1e-8
        assert abs(float(jnp.std(c, ddof=1)) - 1.0) < 1e-8
    y1 = Curve2().regression(x, sigma_true=0.2, key=7)
    y2 = Curve2().regression(x, sigma_true=0.2, key=7)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    labels = Curve2().classification(y_curve=2 * Curve2().calculate_curve(x).reshape(-1), key=0)
    assert set(np.unique(np.asarray(labels))) <= {False, True}


def test_train_pls_runner_step_size_search(tmp_path):
    """End-to-end runner on a tiny problem: returns finite particles and a
    selected step size from the log-spaced grid."""
    from experiments.runners import train_pls_runner
    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    rng = np.random.default_rng(0)
    n = 40
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.5]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::5], x, eigenvalue_threshold=1e-3, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    pls = PLS(basis=basis, cost=cost)
    ed = ExperimentData(
        name="t", problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=x, y=y, name="train"),
        test=Data(x=x, y=y, name="test"),
    )
    particles = pls.initialise_particles(16, key=0)
    out, best_lr, epochs = train_pls_runner(
        pls=pls,
        particles=particles,
        particle_name="t",
        experiment_data=ed,
        simulation_duration=1e-2,
        maximum_number_of_steps=1000,
        early_stopper_patience=float("inf"),
        number_of_step_searches=3,
        step_size_upper=1e-3,
        minimum_change_in_energy_potential=1e-6,
        seed=0,
        metric_to_optimise="loss",
    )
    assert np.all(np.isfinite(np.asarray(out)))
    assert best_lr is not None and epochs > 0


def test_train_pls_runner_rejects_finite_but_diverging_candidate(tmp_path):
    """Pins the documented semantic deviation from the reference
    (``runners.py:300-322`` here vs reference ``runners.py:373``): a
    candidate whose energy NEVER improves on the initial particles must be
    discarded even when its particles stay finite.

    The reference keeps any isfinite candidate — this test constructs a step
    size above the OU stability bound whose trajectory grows slowly enough
    to stay finite for the whole (short) run, i.e. a case where the
    reference semantics would hand the step-size search garbage particles.
    """
    from experiments.runners import train_pls_runner
    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
    from projected_langevin_sampling_tpu.training import train_pls

    rng = np.random.default_rng(1)
    n = 40
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.5]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::5], x, eigenvalue_threshold=1e-3, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    pls = PLS(basis=basis, cost=cost)
    ed = ExperimentData(
        name="t", problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=x, y=y, name="train"),
        test=Data(x=x, y=y, name="test"),
    )
    particles = pls.initialise_particles(16, key=0)
    e0 = float(pls.calculate_energy_potential(particles))

    # find a finite-but-never-improving step size: above the stability bound
    # (energy grows every step) but short enough (duration / eta steps) that
    # nothing overflows to inf in fp64
    duration = 0.1
    bad_eta = None
    for eta in [0.05, 0.02, 0.01, 5e-3]:
        p_i, energies = train_pls(
            pls, particles, int(duration / eta), eta, key=0
        )
        if (
            bool(jnp.isfinite(p_i).all())
            and len(energies)
            and min(float(e) for e in energies) > e0
        ):
            bad_eta = eta
            break
    assert bad_eta is not None, "no finite-but-diverging step size found"
    # ^ the reference's isfinite-only filter (runners.py:373) would KEEP this
    #   candidate: its particles are finite though its energy only ever grew.

    out, best_lr, epochs = train_pls_runner(
        pls=pls,
        particles=particles,
        particle_name="t",
        experiment_data=ed,
        simulation_duration=duration,
        maximum_number_of_steps=int(duration / bad_eta),
        early_stopper_patience=float("inf"),
        number_of_step_searches=1,
        step_size_upper=bad_eta,
        minimum_change_in_energy_potential=1e-30,
        seed=0,
        metric_to_optimise="loss",
    )
    assert best_lr is None and epochs == 0  # the garbage candidate was discarded
    np.testing.assert_array_equal(np.asarray(out), np.asarray(particles))


def test_set_seed_host_rngs_and_key():
    """set_seed pins the host RNGs and returns a JAX key
    (reference src/utils.py:8-22 analog)."""
    import random

    from projected_langevin_sampling_tpu.utils import sample_point, set_seed

    key1 = set_seed(7)
    a = np.random.rand(3)
    b = random.random()
    key2 = set_seed(7)
    np.testing.assert_array_equal(np.random.rand(3), a)
    assert random.random() == b
    import jax

    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key1)), np.asarray(jax.random.key_data(key2))
    )

    x = jnp.arange(10.0).reshape(-1, 1)
    p1 = sample_point(3, x)
    p2 = sample_point(3, x)
    assert p1.shape == (1, 1)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_animate_runner_writes_gif(tmp_path):
    from experiments.runners import animate_pls_1d_particles_runner
    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    rng = np.random.default_rng(0)
    n = 30
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]))
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.5]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::6], x, eigenvalue_threshold=1e-3, verbose=False
    )
    pls = PLS(basis, GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1)))
    particles = pls.initialise_particles(8, key=0)
    ed = ExperimentData(
        name="t", problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=x, y=y, name="train"),
        test=Data(x=x, y=y, name="test"),
    )
    animate_pls_1d_particles_runner(
        pls=pls, particles=particles, particle_name="t", experiment_data=ed,
        animate_1d_path=str(tmp_path), step_size=1e-4, number_of_epochs=20,
        seed=0, number_of_frames=4,
    )
    gif = os.path.join(tmp_path, "pls-t.gif")
    assert os.path.exists(gif) and os.path.getsize(gif) > 0


def test_headline_dir_preference(tmp_path, monkeypatch):
    """_headline_dir picks the most-preferred protocol dir among those tied
    for the maximal result count — and must not drop a complete smooth run
    just because the map run is absent."""
    from experiments import make_results_summary as mrs

    def make(dirname, n):
        for i in range(n):
            d = tmp_path / "experiments" / "uci" / "classification" / dirname / str(i) / "results" / "ds" / "pls-onb"
            d.mkdir(parents=True, exist_ok=True)
            (d / "nll_test.csv").write_text("dataset,pls-onb\nds,0.5\n")

    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    assert mrs._headline_dir("classification") is None
    make("outputs_precond", 3)
    assert mrs._headline_dir("classification").endswith("outputs_precond")
    make("outputs_precond_map", 3)
    assert mrs._headline_dir("classification").endswith("outputs_precond_map")
    # smooth run complete while map is absent in a fresh checkout: smooth wins
    make("outputs_precond_smooth", 3)
    assert mrs._headline_dir("classification").endswith("outputs_precond_smooth")
    # an incomplete more-preferred run must NOT shadow a more complete one
    make("outputs_precond_map", 5)
    assert mrs._headline_dir("classification").endswith("outputs_precond_map")


def test_dump_metrics_long_roundtrip(tmp_path, monkeypatch):
    """dump_metrics_long consolidates every outputs*/ per-seed metric CSV
    into one tidy frame whose values round-trip exactly — this single
    committed artifact is what makes RESULTS.md recomputable from a clean
    clone (the per-seed trees are gitignored)."""
    import pandas as pd

    from experiments import make_results_summary as mrs

    def write(task, protocol, seed, dataset, model, metric, split, value):
        d = (
            tmp_path / "experiments" / "uci" / task / protocol / str(seed)
            / "results" / dataset / model
        )
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{metric}_{split}.csv").write_text(
            f"dataset,{model}\n{dataset},{value}\n"
        )

    write("classification", "outputs", 0, "ds", "pls-onb", "nll", "test", 0.51)
    write("classification", "outputs", 1, "ds", "pls-onb", "nll", "test", 0.49)
    write("classification", "outputs_precond", 0, "ds", "svgp", "acc", "train", 0.9)
    write("regression", "outputs_precond_map", 3, "boston", "pls-onb", "mse", "test", 0.07)
    (tmp_path / "results").mkdir()
    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    mrs.dump_metrics_long()
    out = pd.read_csv(tmp_path / "results" / "uci_metrics_long.csv")
    assert list(out.columns) == [
        "task", "protocol", "split", "dataset", "model", "metric", "seed", "value"
    ]
    assert len(out) == 4
    sel = out[(out.task == "regression") & (out.dataset == "boston")]
    assert sel.iloc[0].protocol == "outputs_precond_map"
    assert sel.iloc[0].seed == 3 and sel.iloc[0].value == 0.07
    nlls = out[(out.metric == "nll")].sort_values("seed").value.tolist()
    assert nlls == [0.51, 0.49]


def test_bench_section_renders_serving_table(tmp_path, monkeypatch):
    """bench_section renders the serving-path (predict) table when
    BENCH_PREDICT.json is present and stays silent when it is absent —
    the hardware file is only written by `bench.py --predict` on the chip
    (CPU runs go to BENCH_PREDICT_CPU_FALLBACK.json and must not render)."""
    import json as _json

    from experiments import make_results_summary as mrs

    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    assert "Serving path" not in mrs.bench_section()

    (tmp_path / "BENCH_PREDICT.json").write_text(
        _json.dumps(
            {
                "config": {
                    "n_star": 4096,
                    "J": 1000,
                    "M": 512,
                    "chunk": 256,
                    "device": "TPU v5 lite0",
                    "backend": "axon",
                },
                "rows": [
                    {
                        "mode": "joint",
                        "n_star": 4096,
                        "sec": 1.25,
                        "points_per_sec": 3276.8,
                        "sample_draws_per_sec": 3276800.0,
                    },
                    {
                        "mode": "chunked[256]",
                        "n_star": 4096,
                        "sec": 0.25,
                        "points_per_sec": 16384.0,
                        "sample_draws_per_sec": 16384000.0,
                    },
                ],
            }
        )
    )
    section = mrs.bench_section()
    assert "Serving path" in section
    assert "chunked[256]" in section
    assert "16,384" in section
    assert "chunk_size=256" in section


def test_collect_clean_clone_fallback():
    """collect() serves a repo-internal UCI protocol from the committed
    results/uci_metrics_long.csv when (or even though) its gitignored
    outputs tree is absent — this is what keeps `make results` reproducing
    the full RESULTS.md from a clean clone."""
    import os

    from experiments.aggregate_seeds import collect

    root = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    outputs = os.path.join(
        root, "experiments", "uci", "classification", "outputs_precond_smooth_cpu"
    )
    long = collect(outputs, "test")
    assert not long.empty
    assert set(long.columns) == {"dataset", "model", "metric", "seed", "value"}
    # the archived sweep covers the real datasets at 10 seeds
    sub = long[(long.dataset == "breast_wdbc") & (long.metric == "nll")]
    assert sub[sub.model == "pls-onb"].seed.nunique() == 10


def test_dump_metrics_long_preserves_archived_protocols(tmp_path, monkeypatch):
    """A partial rerun (one fresh outputs tree on disk) must merge into the
    consolidated CSV, not clobber it: archived rows for protocols whose
    trees are gone stay, and a fresh row replaces its same-key archived
    value."""
    import pandas as pd

    from experiments import make_results_summary as mrs

    d = (
        tmp_path / "experiments" / "uci" / "classification" / "outputs" / "0"
        / "results" / "ds" / "pls-onb"
    )
    d.mkdir(parents=True)
    (d / "nll_test.csv").write_text("dataset,pls-onb\nds,0.40\n")
    (tmp_path / "results").mkdir()
    archived = pd.DataFrame(
        [
            # same key as the fresh row above: must be replaced by 0.40
            ("classification", "outputs", "test", "ds", "pls-onb", "nll", 0, 0.99),
            # protocol with no on-disk tree: must survive the rewrite
            ("regression", "outputs_gone", "test", "boston", "svgp", "mse", 4, 0.07),
        ],
        columns=[
            "task", "protocol", "split", "dataset", "model", "metric", "seed", "value"
        ],
    )
    archived.to_csv(tmp_path / "results" / "uci_metrics_long.csv", index=False)
    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    mrs.dump_metrics_long()
    out = pd.read_csv(tmp_path / "results" / "uci_metrics_long.csv")
    assert len(out) == 2
    fresh = out[(out.protocol == "outputs") & (out.metric == "nll")]
    assert fresh.iloc[0].value == 0.40
    kept = out[out.protocol == "outputs_gone"]
    assert len(kept) == 1 and kept.iloc[0].value == 0.07


def test_section_snapshot_roundtrip(tmp_path, monkeypatch):
    """_snapshot persists a live-rendered section and serves it back when the
    live render is empty (clean clone: the curve-family artifacts are
    gitignored), refreshing whenever live content reappears."""
    from experiments import make_results_summary as mrs

    monkeypatch.setattr(mrs, "SNAPSHOT_DIR", str(tmp_path / "snaps"))
    assert mrs._snapshot("curves", "") == ""          # nothing live, no snapshot
    assert mrs._snapshot("curves", "## A\nv1\n") == "## A\nv1\n"
    assert mrs._snapshot("curves", "") == "## A\nv1\n"  # fallback serves v1
    assert mrs._snapshot("curves", "## A\nv2\n") == "## A\nv2\n"  # live refresh
    assert mrs._snapshot("curves", "") == "## A\nv2\n"


def test_section_snapshot_partial_render_keeps_committed_record(
    tmp_path, monkeypatch
):
    """A partial live render (fewer table rows than the committed snapshot —
    e.g. a one-curve rerun of a 10-curve section) must NOT clobber the full
    record; an equally-complete or fuller render refreshes it."""
    from experiments import make_results_summary as mrs

    monkeypatch.setattr(mrs, "SNAPSHOT_DIR", str(tmp_path / "snaps"))
    full = "## C\n| curve | nll |\n|---|---|\n| a | 1 |\n| b | 2 |\n| c | 3 |\n"
    partial = "## C\n| curve | nll |\n|---|---|\n| a | 9 |\n"
    fuller = full + "| d | 4 |\n"
    assert mrs._snapshot("curves3", full) == full
    assert mrs._snapshot("curves3", partial) == full   # partial kept out
    assert mrs._snapshot("curves3", "") == full        # snapshot intact
    assert mrs._snapshot("curves3", fuller) == fuller  # fuller refreshes
    assert mrs._snapshot("curves3", "") == fuller


def test_loss_attribution_section_structure():
    """The round-4 loss-attribution section (VERDICT #4) is data-driven: it
    tabulates one row per significant headline NLL loss and emits exactly one
    verdict bullet per row, computed from the committed consolidated CSV on a
    clean clone (no outputs trees needed). Guards the attribution evidence
    against silent regressions in the collect()/paired-delta plumbing."""
    from experiments import make_results_summary as mrs

    section = mrs.loss_attribution_section()
    if not section:  # no significant losses — nothing to attribute
        return
    assert "## Loss attribution" in section
    table_rows = [
        line
        for line in section.splitlines()
        if line.startswith("| ") and "dataset" not in line and "---" not in line
    ]
    # verdict bullets live ABOVE the optional mechanism subsection (whose
    # per-dataset bullets share the "- `" prefix but are evidence, not verdicts)
    verdict_part = section.split("### Mechanism")[0]
    verdicts = [
        line for line in verdict_part.splitlines() if line.startswith("- `")
    ]
    assert len(table_rows) >= 1
    assert len(verdicts) == len(table_rows)
    # every verdict is one of the three recognised shapes
    for v in verdicts:
        assert (
            "disappears under" in v
            or "survives every measured toggle" in v
            or "attribution pending" in v
        )
    # the mechanism block renders whenever the committed probe CSV exists —
    # full evidence only from VALIDATED rows (probe NLL reproduces the
    # committed sweep value; results/checkpoint_basis_audit.md), an explicit
    # "pending" notice otherwise
    import os

    import pandas as pd

    csv_path = os.path.join(mrs.ROOT, "results", "gap_attribution.csv")
    if os.path.exists(csv_path):
        assert "### Mechanism" in section
        probe = pd.read_csv(csv_path)
        has_valid = "validated" in probe.columns and bool(probe["validated"].any())
        if has_valid:
            assert "prior residual" in section
        else:
            assert "Pending" in section and "checkpoint_basis_audit" in section


def test_gap_mechanism_validation_gate(tmp_path, monkeypatch):
    """Unvalidated probe rows (basis-rebuild mismatch — results/
    checkpoint_basis_audit.md) must never render as mechanism evidence;
    validated rows must."""
    import pandas as pd

    from experiments import make_results_summary as mrs

    row = dict(
        dataset="breast_wdbc", seed=0, pls_nll=0.1, svgp_nll=0.06, delta=0.04,
        pls_mc_std=0.001, pls_latent_var=0.5, pls_proj_var=0.3,
        pls_noise_var=0.2, svgp_latent_var=0.2, pls_nll_extended=0.1,
        pls_proj_var_extended=0.3,
    )
    (tmp_path / "results").mkdir()
    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    csv = tmp_path / "results" / "gap_attribution.csv"

    pd.DataFrame([{**row, "validated": False}]).to_csv(csv, index=False)
    pending = mrs._gap_mechanism_paragraphs(["breast_wdbc"])
    assert "Pending" in pending and "breast_wdbc" not in pending

    # legacy CSV (pre-gate, no column) is treated the same
    pd.DataFrame([row]).to_csv(csv, index=False)
    assert "Pending" in mrs._gap_mechanism_paragraphs(["breast_wdbc"])

    pd.DataFrame([{**row, "validated": True}]).to_csv(csv, index=False)
    full = mrs._gap_mechanism_paragraphs(["breast_wdbc"])
    assert "prior residual" in full and "`breast_wdbc`" in full
    assert "stationary law" in full  # no NLL drop -> not under-convergence


def test_equilibrate_spread_extends_winning_chain():
    """The spread-equilibration phase (framework extension motivated by
    results/gap_attribution.md: the reference's energy-plateau break stops
    before the particle spread equilibrates) continues the WINNING chain in
    chunks at its selected step size until the mean per-coordinate particle
    variance plateaus. Contract: reference semantics when the option is None
    (same particles, same epochs); with a threshold, epochs grow, the
    selected step size is unchanged, particles stay finite, and the spread
    moves toward the basis's stationary value."""
    from experiments.runners import train_pls_runner
    from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
    from projected_langevin_sampling_tpu.models.costs import GaussianCost
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

    rng = np.random.default_rng(3)
    n = 40
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.5]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::5], x, eigenvalue_threshold=1e-3, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    pls = PLS(basis=basis, cost=cost)
    ed = ExperimentData(
        name="t", problem_type=ProblemType.REGRESSION,
        full=Data(x=x, y=y, name="full"),
        train=Data(x=x, y=y, name="train"),
        test=Data(x=x, y=y, name="test"),
    )
    particles = pls.initialise_particles(16, key=0)
    common = dict(
        pls=pls,
        particles=particles,
        particle_name="t",
        experiment_data=ed,
        # a deliberately SHORT simulation: the winning chain is far from
        # spread equilibrium at the break point (the scenario being fixed);
        # the preconditioned scheme (the headline protocol's) makes the
        # prior-direction relaxation fast enough to observe the plateau
        simulation_duration=2e-2,
        maximum_number_of_steps=100_000,
        early_stopper_patience=float("inf"),
        number_of_step_searches=1,
        step_size_upper=1e-4,
        minimum_change_in_energy_potential=1e-30,
        seed=0,
        metric_to_optimise="loss",
        discretisation="preconditioned",
    )
    out_ref, lr_ref, epochs_ref = train_pls_runner(**common)
    out_ref2, lr_ref2, epochs_ref2 = train_pls_runner(
        **common, equilibrate_spread=None
    )
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_ref2))
    assert (lr_ref, epochs_ref) == (lr_ref2, epochs_ref2)

    out_eq, lr_eq, epochs_eq = train_pls_runner(
        **common, equilibrate_spread=0.01
    )
    assert lr_eq == lr_ref  # the phase never changes the selected step size
    assert epochs_eq > epochs_ref  # ... but runs the winning chain longer
    assert np.all(np.isfinite(np.asarray(out_eq)))
    # the short-run spread is un-equilibrated (noise-only init starts at the
    # PRIOR scale, so equilibration contracts it toward the posterior's);
    # the phase must move it materially and keep it positive and bounded
    spread_ref = float(jnp.mean(jnp.var(out_ref, axis=1)))
    spread_eq = float(jnp.mean(jnp.var(out_eq, axis=1)))
    assert abs(spread_eq - spread_ref) / spread_ref > 0.05
    assert 0.0 < spread_eq < 10 * float(jnp.max(basis.eigenvalues))


def test_poisson_study_section_renders_and_rolls_up(tmp_path, monkeypatch):
    """poisson_study_section renders the paired head-to-head table from the
    committed long CSV (results/poisson_study_long.csv), computes 2-sigma
    paired verdicts per (curve, model, metric), and stays silent when the
    CSV is absent (clean clone before the study runs)."""
    import pandas as pd

    from experiments import make_results_summary as mrs

    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    assert mrs.poisson_study_section() == ""

    rows = []
    for seed in range(6):
        for model, nll, rr in (
            # pls-onb(+m0) ~0.5 nats better with small per-seed spread -> sig
            ("pls-onb", 1.0 + 0.01 * seed, 2.0 + 0.1 * seed),
            ("pls-onb-m0", 1.0 + 0.01 * seed, 2.0 + 0.1 * seed),
            ("pls-ipb", 1.5 + 0.02 * seed, 1.9 + 0.1 * seed),
            ("svgp-gaussian", 1.5 + 0.02 * seed, 2.0 + 0.1 * seed),
        ):
            rows.append(dict(curve="curve1", seed=seed, model=model,
                             metric="nll", split="test", value=nll))
            rows.append(dict(curve="curve1", seed=seed, model=model,
                             metric="rate_rmse", split="test", value=rr))
            # train rows must be ignored by the section
            rows.append(dict(curve="curve1", seed=seed, model=model,
                             metric="nll", split="train", value=99.0))
    (tmp_path / "results").mkdir()
    pd.DataFrame(rows).to_csv(tmp_path / "results" / "poisson_study_long.csv",
                              index=False)
    s = mrs.poisson_study_section()
    assert "curve1" in s and "rate_rmse" in s
    assert "| -0.5250 (6, pls sig) " in s     # onb nll: mean -0.525 delta
    assert "| +0.0000 (6, ns) " in s          # ipb nll tie (zero spread) is ns
    assert "NLL 1 pls / 0 svgp" in s          # rollup counts pls-onb only
    assert "99" not in s                      # train split never rendered


def test_headline_section_model_pair_parameterised(tmp_path, monkeypatch):
    """headline_vs_svgp_section(pls_model=..., svgp_model=...) compares the
    requested variant pair (the Student-T head-to-head) and labels the table
    columns with those names."""
    from experiments import make_results_summary as mrs

    def write(seed, model, value):
        d = (
            tmp_path / "experiments" / "uci" / "regression"
            / "outputs_precond_map" / str(seed) / "results" / "ds" / model
        )
        d.mkdir(parents=True, exist_ok=True)
        (d / "nll_test.csv").write_text(f"dataset,{model}\nds,{value}\n")

    for seed in range(5):
        write(seed, "pls-student-onb", 0.30 + 0.001 * seed)
        write(seed, "svgp-student", 0.50 + 0.003 * seed)
        # the default pair has the OPPOSITE ordering — proof the param matters
        write(seed, "pls-onb", 0.9 + 0.001 * seed)
        write(seed, "svgp", 0.1)
    monkeypatch.setattr(mrs, "ROOT", str(tmp_path))
    s = mrs.headline_vs_svgp_section(
        "regression", ("nll",),
        pls_model="pls-student-onb", svgp_model="svgp-student",
    )
    assert "| dataset | pls-student-onb | svgp-student |" in s
    assert "**pls** (sig)" in s
    default = mrs.headline_vs_svgp_section("regression", ("nll",))
    assert "svgp (sig)" in default and "pls-student" not in default
