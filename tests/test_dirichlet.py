"""Dirichlet classification transform (the round-2 fix for flat
classification probabilities).

Root cause being locked in here: learning kernel hyperparameters by
regressing on RAW 0/1 labels yields outputscale ~0.1; the projected-kernel
prior is then too small for the sigmoid to ever leave 0.5 (train NLL pinned
at log 2). The reference avoids this via gpytorch's
DirichletClassificationLikelihood — logit-scale targets with fixed
per-point noise — which this framework now mirrors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import BernoulliCost
from projected_langevin_sampling_tpu.models.gaussian_process.dirichlet import (
    dirichlet_classification_targets,
)
from projected_langevin_sampling_tpu.models.gaussian_process.training import (
    fit_exact_gp,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import train_pls


def test_transform_matches_hand_computation():
    labels = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    targets, sigma2, num_classes = dirichlet_classification_targets(
        labels, alpha_epsilon=0.01
    )
    assert num_classes == 2
    assert targets.shape == (2, 4) and sigma2.shape == (2, 4)
    # member: alpha = 1.01; non-member: alpha = 0.01 (Milios et al. 2018)
    s2_member = np.log(1 / 1.01 + 1)
    s2_non = np.log(1 / 0.01 + 1)
    t_member = np.log(1.01) - 0.5 * s2_member
    t_non = np.log(0.01) - 0.5 * s2_non
    np.testing.assert_allclose(float(sigma2[1, 1]), s2_member, rtol=1e-6)
    np.testing.assert_allclose(float(sigma2[1, 0]), s2_non, rtol=1e-6)
    np.testing.assert_allclose(float(targets[1, 1]), t_member, rtol=1e-6)
    np.testing.assert_allclose(float(targets[1, 0]), t_non, rtol=1e-6)
    # class-0 row is the complement pattern
    np.testing.assert_allclose(float(targets[0, 0]), t_member, rtol=1e-6)
    np.testing.assert_allclose(float(targets[0, 1]), t_non, rtol=1e-6)


def _separable_1d(n=80):
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-2, 2, (n, 1)), axis=0)
    y = (np.sin(1.5 * x[:, 0]) > 0).astype(np.float64)
    return jnp.asarray(x), jnp.asarray(y)


def test_dirichlet_fit_learns_large_outputscale():
    """The learned outputscale on Dirichlet targets must be orders of
    magnitude above the raw-label fit (which is what flattened round 1)."""
    x, y = _separable_1d()
    kernel0 = ARDKernel(lengthscales=jnp.ones(1), outputscale=jnp.asarray(1.0))

    gp_raw, _ = fit_exact_gp(x, y, kernel0, number_of_epochs=400, learning_rate=0.05)
    targets, sigma2, _ = dirichlet_classification_targets(y)
    gp_dir, _ = fit_exact_gp(
        x,
        targets[1],
        kernel0,
        number_of_epochs=400,
        learning_rate=0.05,
        fixed_noise_variances=sigma2[1],
    )
    raw_scale = float(gp_raw.kernel.outputscale)
    dir_scale = float(gp_dir.kernel.outputscale)
    assert raw_scale < 0.5, raw_scale  # the failure mode: tiny prior
    assert dir_scale > 10 * raw_scale, (raw_scale, dir_scale)


def test_classification_probabilities_leave_half():
    """End-to-end: PLS-Bernoulli on a Dirichlet-learned kernel produces
    decisive train probabilities (round 1 was pinned at 0.5 +- 0.002)."""
    x, y = _separable_1d()
    kernel0 = ARDKernel(lengthscales=jnp.ones(1), outputscale=jnp.asarray(1.0))
    targets, sigma2, num_classes = dirichlet_classification_targets(y)
    gps = [
        fit_exact_gp(
            x, targets[c], kernel0, number_of_epochs=400, learning_rate=0.05,
            fixed_noise_variances=sigma2[c],
        )[0]
        for c in range(num_classes)
    ]
    avg = ARDKernel(
        lengthscales=jnp.exp(
            jnp.mean(jnp.stack([jnp.log(g.kernel.lengthscales) for g in gps]), 0)
        ),
        outputscale=jnp.exp(
            jnp.mean(jnp.stack([jnp.log(g.kernel.outputscale) for g in gps]))
        ),
    )
    z = x[::5]
    pls_kernel = PLSKernel(base_kernel=avg, approximation_samples=z)
    basis = build_orthonormal_basis(pls_kernel, z, x, eigenvalue_threshold=1e-3, verbose=False)
    cost = BernoulliCost(y_train=y)
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(100, key=0)
    trained, energies = train_pls(pls, particles, 8000, 1e-3, key=1)
    assert energies[-1] < energies[0]
    probs = np.asarray(pls(x=x, particles=trained, key=2).probs)
    # decisively away from 0.5 and aligned with the labels
    assert np.mean(np.abs(probs - 0.5)) > 0.15, np.mean(np.abs(probs - 0.5))
    acc = np.mean((probs > 0.5) == np.asarray(y).astype(bool))
    assert acc > 0.85, acc
    nll = -np.mean(
        np.asarray(y) * np.log(probs) + (1 - np.asarray(y)) * np.log(1 - probs)
    )
    assert nll < 0.5, nll  # round 1 was pinned at log 2 ~ 0.693
