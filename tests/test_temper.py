"""Tempering tests (reference ``tests/test_temper.py``): the closed-form
scale and the scaled predictive variance for GP and PLS."""

import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.models.gaussian_process import (
    ExactGP,
    GaussianLikelihood,
    init_svgp,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.temper import TemperGP, TemperPLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def _data(n=20, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    return x, y


def test_temper_gp_scale_formula():
    x, y = _data()
    gp = ExactGP(
        mean_constant=jnp.asarray(0.0),
        kernel=ARDKernel(jnp.asarray([0.7]), jnp.asarray(1.0)),
        noise=jnp.asarray(0.05),
        x_train=x[:12],
        y_train=y[:12],
    )
    x_cal, y_cal = x[12:], y[12:]
    tempered = TemperGP(gp=gp, x_calibration=x_cal, y_calibration=y_cal)
    pred = gp.predict_y(x_cal)
    expected_scale = float(
        2.0 * jnp.mean(jnp.square(y_cal - pred.mean) / pred.variance)
    )
    assert tempered.scale == pytest.approx(expected_scale, rel=1e-10)

    out = tempered(x_cal)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(pred.mean), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out.variance), np.asarray(pred.variance) * expected_scale, rtol=1e-10
    )


def test_temper_gp_works_with_svgp():
    x, y = _data()
    svgp = init_svgp(
        0.0,
        ARDKernel(jnp.asarray([0.7]), jnp.asarray(1.0)),
        GaussianLikelihood(noise=jnp.asarray(0.05)),
        x[::4],
    )
    tempered = TemperGP(gp=svgp, x_calibration=x, y_calibration=y)
    assert np.isfinite(tempered.scale)
    assert tempered(x).variance.shape == (20,)


def _pls(x, y, cost_cls=GaussianCost):
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.7]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    basis = build_orthonormal_basis(
        kernel, x[::3], x, eigenvalue_threshold=1e-6, verbose=False
    )
    if cost_cls is GaussianCost:
        cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.05))
    else:
        cost = BernoulliCost(y_train=jnp.asarray((np.asarray(y) > 0).astype(float)))
    return PLS(basis=basis, cost=cost)


def test_temper_pls_scales_variance():
    x, y = _data()
    pls = _pls(x, y)
    particles = pls.initialise_particles(64, key=0)
    tempered = TemperPLS(
        x_calibration=x, y_calibration=y, pls=pls, particles=particles, key=1
    )
    assert np.isfinite(tempered.scale) and tempered.scale > 0
    out = tempered(x)
    assert out.variance.shape == (20,)


def test_temper_pls_requires_gaussian_cost():
    x, y = _data()
    pls = _pls(x, y, cost_cls=BernoulliCost)
    particles = pls.initialise_particles(16, key=0)
    with pytest.raises(AssertionError):
        TemperPLS(x_calibration=x, y_calibration=y, pls=pls, particles=particles)
    # debug bypasses the check but predict returns a Bernoulli -> scale breaks;
    # the reference has the same debug semantics (temper/pls.py:24-29)


def test_temper_pls_classification_contracts_inflated_cloud():
    """TemperPLSClassification (new capability, round-5 mechanism fix): on a
    cloud whose spread was artificially inflated, the fitted contraction is
    < 1 and the calibration NLL beats the untempered predictive; s=1 being
    in the grid guarantees it never loses on the calibration split."""
    from projected_langevin_sampling_tpu.models.temper import (
        TemperPLSClassification,
    )

    x, y = _data(n=40, seed=3)
    y_bin = jnp.asarray((np.asarray(y) > 0).astype(float))
    pls = _pls(x, y, cost_cls=BernoulliCost)
    particles = pls.initialise_particles(128, key=0)
    # inflate the cloud 5x around its mean — the stationary-law failure mode
    inflated = jnp.mean(particles, axis=1, keepdims=True) + 5.0 * (
        particles - jnp.mean(particles, axis=1, keepdims=True)
    )
    tempered = TemperPLSClassification(
        x_calibration=x, y_calibration=y_bin, pls=pls, particles=inflated, key=1
    )
    assert tempered.scale < 1.0
    raw_probs = jnp.mean(
        pls.cost.link_function.transform(
            pls.predict_untransformed_samples(particles=inflated, x=x, key=2)
        ),
        axis=1,
    )
    p = np.clip(np.asarray(raw_probs, dtype=np.float64), 1e-12, 1 - 1e-12)
    yb = np.asarray(y_bin, dtype=np.float64)
    raw_nll = float(-np.mean(yb * np.log(p) + (1 - yb) * np.log1p(-p)))
    assert tempered.calibration_nll <= raw_nll + 1e-6
    probs = tempered(x)
    assert probs.shape == (40,)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
