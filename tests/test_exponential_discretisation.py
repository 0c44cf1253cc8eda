"""OU-splitting ("exponential") discretisation for the ONB general path.

The prior drift -U/lambda is linear and diagonal, so its sub-step (with the
matching noise share) integrates exactly:
    U' = d (U - eta B^T dc) + sqrt(lambda (1 - d^2)) eps,  d = exp(-eta/lambda).
Unconditionally stable in the prior part — the explicit-Euler bound
eta < 2 lambda_min disappears; only the (mild) data-term curvature limits
the step. Motivation: the nystrom ONB scaling's stiff spectra under
non-Gaussian costs (docs/DESIGN.md "ONB prior scaling").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    SigmoidLinkFunction,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import train_pls


def _problem(scaling="reference"):
    rng = np.random.default_rng(0)
    n, m = 60, 12
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0))
    f = np.sin(2 * np.asarray(x)[:, 0])
    y = jnp.asarray(f + 0.15 * rng.normal(size=n))
    kernel = ARDKernel(lengthscales=jnp.asarray([0.8]), outputscale=jnp.asarray(1.0))
    z = jnp.asarray(np.linspace(-2.9, 2.9, m)[:, None])
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    basis = build_orthonormal_basis(pls_kernel, z, x, verbose=False, scaling=scaling)
    return basis, y


def _exp_stationary_mean(basis, y, noise, eta):
    """Closed-form stationary mean of the exponential scheme for the
    Gaussian-identity cost: mu = D(mu - eta (G mu - b)) with D = diag(d)."""
    b_mat = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    g = b_mat.T @ b_mat / noise
    rhs = b_mat.T @ np.asarray(y, np.float64) / noise
    d = np.exp(-eta / lam)
    a = np.eye(lam.size) - np.diag(d) @ (np.eye(lam.size) - eta * g)
    return np.linalg.solve(a, eta * d * rhs)


def test_exponential_matches_closed_form_gaussian():
    basis, y = _problem()
    noise = 0.15**2
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise), y_train=y,
        link_function=IdentityLinkFunction(),
    )
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(1024, seed=0)
    eta = 2e-3
    trained, energies = train_pls(
        pls, particles, 8000, eta, key=1, discretisation="exponential",
    )
    assert energies[-1] < energies[0]
    mu = _exp_stationary_mean(basis, y, noise, eta)
    b_mat = np.asarray(basis.train_projection, dtype=np.float64)
    pred_hat = b_mat @ np.asarray(trained, np.float64).mean(axis=1)
    pred = b_mat @ mu
    assert np.abs(pred_hat - pred).max() < 0.1 * (np.abs(pred).max() + 1e-6)


def test_exponential_stable_where_euler_diverges():
    """At a step far beyond 2*lambda_min the Euler chain blows up while the
    exponential chain stays finite and still fits the data."""
    basis, y = _problem()
    noise = 0.15**2
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise), y_train=y,
        link_function=IdentityLinkFunction(),
    )
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(256, seed=0)
    lam_min = float(np.asarray(basis.eigenvalues).min())
    eta = 10.0 * lam_min  # way past the Euler prior-stability bound
    euler, _ = train_pls(
        pls, particles, 400, eta, key=1, fast_path="off", discretisation="euler",
    )
    expo, energies = train_pls(
        pls, particles, 400, eta, key=1, discretisation="exponential",
    )
    assert not bool(jnp.isfinite(euler).all()) or float(jnp.abs(euler).max()) > 1e6
    assert bool(jnp.isfinite(expo).all())
    assert float(jnp.abs(expo).max()) < 1e3
    assert energies[-1] < energies[0]


def test_exponential_agrees_with_euler_at_small_steps_bernoulli():
    """Non-Gaussian cost: for small steps both discretisations sample the
    same law — compare predictive train probabilities."""
    rng = np.random.default_rng(3)
    basis, _ = _problem()
    n = basis.train_projection.shape[0]
    y = jnp.asarray((np.sin(2 * np.linspace(-3, 3, n)) > 0).astype(float))
    cost = BernoulliCost(y_train=y, link_function=SigmoidLinkFunction())
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(2048, seed=0)
    lam_min = float(np.asarray(basis.eigenvalues).min())
    eta = 0.2 * lam_min  # small enough for Euler stability
    steps = 4000
    pe, _ = train_pls(pls, particles, steps, eta, key=5, fast_path="off")
    px, _ = train_pls(pls, particles, steps, eta, key=6, discretisation="exponential")
    prob_e = np.asarray(pls.predict(x=basis.x_induce, particles=pe, key=0).probs)
    prob_x = np.asarray(pls.predict(x=basis.x_induce, particles=px, key=0).probs)
    np.testing.assert_allclose(prob_e, prob_x, atol=0.12)


def test_exponential_ipb_routes_through_w_view():
    """IPB + exponential runs via the W-space ONB view (``ipb_w_space_view``)
    and converges — round 2 raised here; the view removed that limitation."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (40, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]))
    kernel = ARDKernel(lengthscales=jnp.asarray([0.6]), outputscale=jnp.asarray(1.0))
    z = jnp.asarray(np.linspace(-2, 2, 8)[:, None])
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    basis = build_inducing_point_basis(pls_kernel, z, jnp.sin(2 * z[:, 0]), x)
    cost = GaussianCost(observation_noise=jnp.asarray(0.04), y_train=y)
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(64, seed=0)
    trained, energies = train_pls(
        pls, particles, 2000, 1e-3, key=1, discretisation="exponential"
    )
    assert trained.shape == particles.shape
    assert bool(jnp.isfinite(trained).all())
    assert energies[-1] < energies[0]
