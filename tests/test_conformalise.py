"""Conformal prediction tests (reference ``tests/test_conformalise.py``):
calibration quantile math, coverage guarantee on held-out data, median
clamping, interval widths, and variance-from-interval."""

import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.conformalise import (
    ConformalPrediction,
    ConformaliseGP,
    ConformalisePLS,
)
from projected_langevin_sampling_tpu.models.conformalise.base import ConformaliseBase
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.gaussian_process import ExactGP
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


class _FixedWidth(ConformaliseBase):
    """Deterministic stub: median 0, raw bounds +/- width."""

    def __init__(self, x_cal, y_cal, width=1.0):
        self.width = width
        super().__init__(x_calibration=x_cal, y_calibration=y_cal)

    def _predict_uncalibrated_coverage(self, x, coverage):
        zeros = jnp.zeros(x.shape[0], dtype=jnp.float64)
        return zeros - self.width, zeros + self.width

    def predict_median(self, x):
        return jnp.zeros(x.shape[0], dtype=jnp.float64)


def test_calibration_quantile_math():
    """Scores are max(lower-y, y-upper); calibration is their (n+1)c/n quantile
    (reference base.py:58-90), checked against a hand computation."""
    y_cal = jnp.asarray(np.linspace(-3.0, 3.0, 10))
    x_cal = jnp.zeros((10, 1))
    model = _FixedWidth(x_cal, y_cal, width=1.0)
    scores = np.maximum(-1.0 - np.asarray(y_cal), np.asarray(y_cal) - 1.0)
    coverage = 0.8
    q = np.clip(11 * coverage / 10, 0, 1)
    expected = np.quantile(scores, q)
    assert model._calculate_calibration(coverage) == pytest.approx(expected, rel=1e-10)

    lower, upper = model.predict_coverage(x_cal, coverage)
    np.testing.assert_allclose(np.asarray(upper - lower) / 2, 1.0 + expected, rtol=1e-10)


def test_bounds_never_cross_median():
    y_cal = jnp.asarray(np.zeros(10))  # tiny scores -> negative calibration
    x_cal = jnp.zeros((10, 1))
    model = _FixedWidth(x_cal, y_cal, width=0.5)
    lower, upper = model.predict_coverage(x_cal, coverage=0.1)
    median = model.predict_median(x_cal)
    assert np.all(np.asarray(lower) <= np.asarray(median) + 1e-12)
    assert np.all(np.asarray(upper) >= np.asarray(median) - 1e-12)


def test_predict_variance_is_half_width_at_two_thirds():
    y_cal = jnp.asarray(np.linspace(-2, 2, 20))
    x_cal = jnp.zeros((20, 1))
    model = _FixedWidth(x_cal, y_cal)
    lower, upper = model.predict_coverage(x_cal, coverage=2 / 3)
    np.testing.assert_allclose(
        np.asarray(model.predict_variance(x_cal)),
        np.asarray(upper - lower) / 2,
        rtol=1e-10,
    )


def _regression_setup(n=60, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    return x, y


def test_conformalise_gp_end_to_end_coverage():
    x, y = _regression_setup()
    x_fit, y_fit = x[::2], y[::2]
    x_cal, y_cal = x[1::2], y[1::2]
    gp = ExactGP(
        mean_constant=jnp.asarray(0.0),
        kernel=ARDKernel(jnp.asarray([0.7]), jnp.asarray(1.0)),
        noise=jnp.asarray(0.02),
        x_train=x_fit,
        y_train=y_fit,
    )
    conf = ConformaliseGP(gp=gp, x_calibration=x_cal, y_calibration=y_cal)
    pred = conf(x_cal, coverage=0.9)
    assert isinstance(pred, ConformalPrediction)
    inside = np.mean(
        (np.asarray(y_cal) >= np.asarray(pred.lower))
        & (np.asarray(y_cal) <= np.asarray(pred.upper))
    )
    assert inside >= 0.85  # split-conformal coverage guarantee (on the cal set)
    assert conf.calculate_average_interval_width(x_cal, 0.9) > 0


def test_conformalise_pls_quantile_bounds():
    x, y = _regression_setup(n=40)
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.7]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::4], x, eigenvalue_threshold=1e-6, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.05))
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(128, key=0)
    conf = ConformalisePLS(
        x_calibration=x, y_calibration=y, pls=pls, particles=particles, key=1
    )
    pred = conf(x, coverage=0.9)
    assert np.all(np.asarray(pred.lower) <= np.asarray(pred.upper))
    inside = np.mean(
        (np.asarray(y) >= np.asarray(pred.lower))
        & (np.asarray(y) <= np.asarray(pred.upper))
    )
    assert inside >= 0.85
    med = conf.predict_median(x)
    assert med.shape == (40,)
