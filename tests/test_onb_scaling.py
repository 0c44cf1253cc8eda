"""ONB eigenvector-scaling semantics: the reference formula vs the consistent
empirical-KKL ("nystrom") scaling.

Background (full derivation in DESIGN.md "ONB prior scaling"): the reference
scales eigenvectors as V/sqrt(M_k*lambda) (``orthonormal.py:62-68``), which
implies a function-space prior variance of r(x,x) = (1/M) k(x,Z) k(Z,x) —
a potentially severe underestimate of k(x,x) for smooth kernels. The
"nystrom" option scales as V/(sqrt(M)*lambda), for which
Vt @ Lambda @ Vt^T == Kzz^{-1} exactly, so the implied prior is the Nystrom
approximation Qff = k(x,Z) Kzz^{-1} k(Z,x) and the Gaussian-cost stationary
posterior mean coincides with the Titsias-optimal SVGP mean.

These tests also pin the sampler-correctness invariant found during the
round-2 diagnosis: for a Gaussian cost the implemented Langevin scan's
particle mean converges to the closed-form stationary mean of the implemented
potential, under BOTH scalings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import train_pls


def _problem(n=60, m=12, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0))
    f = np.sin(2 * np.asarray(x)[:, 0]) + 0.5 * np.asarray(x)[:, 0]
    y = jnp.asarray(f + np.sqrt(noise) * rng.normal(size=n))
    z = jnp.asarray(np.linspace(-2.9, 2.9, m)[:, None])
    kernel = ARDKernel(lengthscales=jnp.asarray([0.9]), outputscale=jnp.asarray(1.3))
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    return x, y, z, kernel, pls_kernel, noise


def _stationary_mean(basis, y, noise):
    """Closed-form minimiser of the implemented potential
    cost + 1/2 U^T Lambda^{-1} U for the Gaussian-identity cost."""
    b = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    a = b.T @ b / noise + np.diag(1.0 / lam)
    return np.linalg.solve(a, b.T @ np.asarray(y, dtype=np.float64) / noise)


def test_nystrom_prior_variance_is_nystrom_qff():
    x, y, z, kernel, pls_kernel, noise = _problem()
    basis = build_orthonormal_basis(
        pls_kernel, z, x, verbose=False, scaling="nystrom"
    )
    b = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    prior_var = np.sum(b**2 * lam[None, :], axis=1)
    kzz = np.asarray(kernel(z, z), dtype=np.float64)
    kzx = np.asarray(kernel(z, x), dtype=np.float64)
    qff = np.sum(kzx * np.linalg.solve(kzz, kzx), axis=0)
    np.testing.assert_allclose(prior_var, qff, rtol=1e-8, atol=1e-10)
    # and Vt Lambda Vt^T == Kzz^{-1}
    vt = np.asarray(basis.scaled_eigenvectors, dtype=np.float64)
    np.testing.assert_allclose(
        vt @ np.diag(lam) @ vt.T, np.linalg.inv(kzz), rtol=1e-7, atol=1e-9
    )


def test_reference_prior_variance_is_r_kernel():
    x, y, z, kernel, pls_kernel, noise = _problem()
    basis = build_orthonormal_basis(
        pls_kernel, z, x, verbose=False, scaling="reference"
    )
    b = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    prior_var = np.sum(b**2 * lam[None, :], axis=1)
    kzx = np.asarray(kernel(z, x), dtype=np.float64)
    r_diag = np.sum(kzx**2, axis=0) / z.shape[0]
    np.testing.assert_allclose(prior_var, r_diag, rtol=1e-8, atol=1e-10)


def test_nystrom_stationary_mean_equals_titsias():
    x, y, z, kernel, pls_kernel, noise = _problem()
    basis = build_orthonormal_basis(
        pls_kernel, z, x, verbose=False, scaling="nystrom"
    )
    mu = _stationary_mean(basis, y, noise)
    pred_mean = np.asarray(basis.train_projection, dtype=np.float64) @ mu
    # Titsias-optimal q(u) posterior mean at the train points
    kzz = np.asarray(kernel(z, z), dtype=np.float64)
    kzx = np.asarray(kernel(z, x), dtype=np.float64)
    sigma = kzz + kzx @ kzx.T / noise
    mu_u = kzz @ np.linalg.solve(sigma, kzx @ np.asarray(y, np.float64) / noise)
    titsias_mean = kzx.T @ np.linalg.solve(kzz, mu_u)
    np.testing.assert_allclose(pred_mean, titsias_mean, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("scaling", ["reference", "nystrom"])
def test_langevin_converges_to_stationary_mean(scaling):
    """The jitted Langevin scan's particle mean matches the closed-form
    stationary mean of the implemented potential — the sampler converges to
    the right law (round-2 diagnosis invariant)."""
    x, y, z, kernel, pls_kernel, noise = _problem()
    basis = build_orthonormal_basis(pls_kernel, z, x, verbose=False, scaling=scaling)
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise),
        y_train=y,
        link_function=IdentityLinkFunction(),
    )
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(number_of_particles=512, seed=0)
    # stable step for the stiff linear drift A = B^T B / s2 + Lambda^{-1}:
    # eta < 2/lambda_max(A); run ~10 relaxation times of the slowest mode
    b = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    a_eigs = np.linalg.eigvalsh(b.T @ b / noise + np.diag(1.0 / lam))
    step = float(1.0 / a_eigs.max())
    n_epochs = int(min(10.0 / a_eigs.min() / step, 60000))
    particles, _ = train_pls(
        pls=pls,
        particles=particles,
        number_of_epochs=n_epochs,
        step_size=step,
        early_stopper_patience=1e9,
        seed=0,
        fast_path="off",
    )
    mu_hat = np.asarray(jnp.mean(particles, axis=1), dtype=np.float64)
    mu = _stationary_mean(basis, y, noise)
    # compare in prediction space (train-point means), where scaling-induced
    # coordinate magnitudes are normalised away
    b = np.asarray(basis.train_projection, dtype=np.float64)
    pred_hat, pred = b @ mu_hat, b @ mu
    resid = np.abs(pred_hat - pred)
    scale = np.abs(pred).max() + 1e-6
    # Monte-Carlo error with J=512 particles: tolerate a few percent
    assert resid.max() / scale < 0.12, (resid.max(), scale)
    np.testing.assert_allclose(
        np.mean((pred_hat - np.asarray(y)) ** 2),
        np.mean((pred - np.asarray(y)) ** 2),
        rtol=0.15,
    )


def test_nystrom_matheron_prior_marginals_match_k():
    """With particles drawn from the prior N(0, Lambda), the Matheron
    prediction's marginal variance under nystrom scaling is exactly k(x,x)
    (the correction terms cancel; the joint's bottom-right block is the
    exact base gram)."""
    x, y, z, kernel, pls_kernel, noise = _problem()
    basis = build_orthonormal_basis(pls_kernel, z, x, verbose=False, scaling="nystrom")
    j = 40000
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    lam = basis.eigenvalues
    particles = jnp.sqrt(lam)[:, None] * jax.random.normal(
        k1, (lam.shape[0], j), dtype=lam.dtype
    )
    x_star = jnp.asarray(np.linspace(-3.5, 3.5, 9)[:, None])
    samples = basis.predict_untransformed_samples(
        particles=particles, x=x_star, key=k2
    )
    var_hat = np.asarray(jnp.var(samples, axis=1))
    k_diag = np.asarray(kernel(x_star, x_star, diag=True))
    np.testing.assert_allclose(var_hat, k_diag, rtol=0.08, atol=0.01)


def test_nystrom_rejects_numerically_zero_eigenvalues():
    """Untruncated noise-level eigenvalues under scaling='nystrom' would give
    1/lambda basis columns that overflow fp32 — the build must fail fast and
    name relative_eigenvalue_threshold."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(0)
    # duplicated inducing points => k(Z,Z) is exactly rank-deficient
    z = np.concatenate([np.linspace(-1, 1, 4)] * 2)[:, None]
    x = np.sort(rng.uniform(-1, 1, (20, 1)), axis=0)
    base = ARDKernel(lengthscales=jnp.asarray([0.5]), outputscale=jnp.asarray(1.0))
    kernel = PLSKernel(base_kernel=base, approximation_samples=jnp.asarray(x))
    with pytest.raises(ValueError, match="relative_eigenvalue_threshold"):
        build_orthonormal_basis(
            kernel, jnp.asarray(z), jnp.asarray(x), verbose=False,
            scaling="nystrom",
        )
    # with truncation the same geometry builds fine
    basis = build_orthonormal_basis(
        kernel, jnp.asarray(z), jnp.asarray(x), verbose=False,
        scaling="nystrom", relative_eigenvalue_threshold=1e-10,
    )
    assert bool(jnp.isfinite(basis.train_projection).all())
