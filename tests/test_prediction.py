"""Prediction-path correctness: the pathwise-conditioned predictive samples
must have the right FIRST and SECOND moments — mean equal to the projected
posterior mean function and variance consistent with the function-space
posterior under the projected kernel (the quantities the paper's SVGP
equivalence is about), and the Z-union-x augmentation must keep in-sample
predictions consistent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel, ard_gram
from projected_langevin_sampling_tpu.training import langevin_steps

SIGMA2 = 0.1


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    n, m = 40, 10
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.5]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-6, verbose=False)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    pls = PLS(basis=basis, cost=cost)

    b = np.asarray(basis.train_projection)
    lam = np.asarray(basis.eigenvalues)
    a = b.T @ b / SIGMA2 + np.diag(1.0 / lam)
    rhs = b.T @ np.asarray(y) / SIGMA2
    eta = 0.5 / np.linalg.eigvalsh(a).max()
    steps = int(np.ceil(12.0 / (eta * np.linalg.eigvalsh(a).min())))
    particles = pls.initialise_particles(4000, key=0)
    particles = langevin_steps(basis, cost, particles, jax.random.key(1), eta, steps)
    return pls, particles, x, y, z, a, rhs


def test_predictive_mean_matches_posterior_mean_function(trained):
    """E[prediction at x*] = k(x*, Z) Vt A^{-1} b — the projected posterior
    mean function evaluated off the training grid."""
    pls, particles, x, y, z, a, rhs = trained
    basis = pls.basis
    x_test = jnp.asarray(np.linspace(-1.8, 1.8, 15)[:, None])

    u_mean_exact = np.linalg.solve(a, rhs)
    k_xz = np.asarray(ard_gram(basis.kernel.base_kernel, x_test, basis.x_induce))
    mean_fn_exact = k_xz @ np.asarray(basis.scaled_eigenvectors) @ u_mean_exact

    # average predictive samples over particles AND predictive-noise draws
    samples = []
    for i in range(6):
        samples.append(
            np.asarray(
                pls.predict_untransformed_samples(
                    particles=particles, x=x_test, key=jax.random.key(10 + i)
                )
            )
        )
    emp_mean = np.concatenate(samples, axis=1).mean(axis=1)
    assert np.max(np.abs(emp_mean - mean_fn_exact)) < 0.1 * max(
        np.abs(mean_fn_exact).max(), 1.0
    )


def test_injected_noise_prediction_is_linear_in_particles(trained):
    """With injected noise, prediction is an affine map of the particles
    (Matheron's rule): predict(U1) - predict(U2) == k Vt (U1 - U2)."""
    pls, particles, x, y, z, a, rhs = trained
    basis = pls.basis
    m_k = basis.approximation_dimension
    x_test = jnp.asarray(np.linspace(-1, 1, 5)[:, None])
    rng = np.random.default_rng(3)
    u1 = jnp.asarray(rng.normal(size=(m_k, 7)))
    u2 = jnp.asarray(rng.normal(size=(m_k, 7)))
    noise = jnp.asarray(rng.normal(size=(m_k + 5, 7)))
    p1 = pls.predict_untransformed_samples(particles=u1, x=x_test, noise=noise)
    p2 = pls.predict_untransformed_samples(particles=u2, x=x_test, noise=noise)
    k_xz = np.asarray(ard_gram(basis.kernel.base_kernel, x_test, basis.x_induce))
    expected = k_xz @ np.asarray(basis.scaled_eigenvectors) @ np.asarray(u1 - u2)
    np.testing.assert_allclose(np.asarray(p1 - p2), expected, rtol=1e-8, atol=1e-10)


def test_predictive_noise_covariance_blocks(trained):
    """sample_predictive_noise draws from the joint [[Lambda, B^T],[B, r]]
    covariance (reference orthonormal.py:174-214) — check empirically."""
    pls, particles, x, y, z, a, rhs = trained
    basis = pls.basis
    m_k = basis.approximation_dimension
    x_test = x[:4]
    draws = []
    for i in range(40):
        draws.append(
            np.asarray(
                basis.sample_predictive_noise(
                    jnp.zeros((m_k, 500)), x_test, key=jax.random.key(i)
                )
            )
        )
    all_draws = np.concatenate(draws, axis=1)  # (m_k + 4, 20000)
    emp_cov = np.cov(all_draws)
    lam = np.asarray(basis.eigenvalues)
    np.testing.assert_allclose(
        np.diag(emp_cov)[:m_k], lam, rtol=0.15, atol=5e-3
    )
    # test-block diagonal: r(x, x) with Z-union-x augmentation
    gram_x = np.asarray(
        basis.kernel.forward(x1=x_test, x2=x_test, additional_approximation_samples=x_test)
    )
    np.testing.assert_allclose(
        np.diag(emp_cov)[m_k:], np.diag(gram_x), rtol=0.15, atol=5e-3
    )


def test_predict_train_points_match_train_prediction_mean(trained):
    """At the training inputs, the predictive mean should agree with the
    in-training prediction samples' mean (consistency of the two code paths)."""
    pls, particles, x, y, z, a, rhs = trained
    train_pred = np.asarray(
        pls.basis.calculate_untransformed_train_prediction_samples(particles)
    ).mean(axis=1)
    samples = []
    for i in range(6):
        samples.append(
            np.asarray(
                pls.predict_untransformed_samples(
                    particles=particles, x=x, key=jax.random.key(20 + i)
                )
            )
        )
    pred = np.concatenate(samples, axis=1).mean(axis=1)
    assert np.max(np.abs(pred - train_pred)) < 0.15


def test_chunked_prediction_matches_marginals(trained):
    """Chunked serving path: per-point marginal predictive law matches the
    exact joint (only cross-chunk noise correlations are dropped)."""
    pls, particles, x, y, z, a, rhs = trained
    x_test = jnp.asarray(np.linspace(-1.5, 1.5, 24)[:, None])

    def stats(chunk_size, n_rep=8):
        draws = []
        for i in range(n_rep):
            draws.append(
                np.asarray(
                    pls.predict_samples(
                        particles=particles, x=x_test,
                        key=jax.random.key(100 + i), chunk_size=chunk_size,
                    )
                )
            )
        flat = np.concatenate(draws, axis=1)
        return flat.mean(axis=1), flat.var(axis=1)

    mean_full, var_full = stats(None)
    mean_chunk, var_chunk = stats(7)  # deliberately not dividing 24
    scale = np.abs(mean_full).max() + 1.0
    np.testing.assert_allclose(mean_chunk, mean_full, atol=0.1 * scale)
    np.testing.assert_allclose(var_chunk, var_full, rtol=0.35, atol=0.02)


def test_chunked_prediction_ipb_matches_marginals(trained):
    """The chunked serving path's host-side kernel pre-augmentation must also
    work for the inducing-point basis (``basis.replace(kernel=...)`` +
    zero-row sentinel), with per-point marginals matching the exact joint."""
    from projected_langevin_sampling_tpu.models.basis import (
        build_inducing_point_basis,
    )

    pls_onb, _, x, y, z, a, rhs = trained
    y_induce = jnp.asarray(np.interp(np.asarray(z)[:, 0], np.asarray(x)[:, 0], np.asarray(y)))
    basis = build_inducing_point_basis(
        kernel=pls_onb.basis.kernel, x_induce=z, y_induce=y_induce, x_train=x
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(3000, key=3)
    particles = langevin_steps(basis, cost, particles, jax.random.key(4), 1e-3, 400)
    x_test = jnp.asarray(np.linspace(-1.5, 1.5, 24)[:, None])

    def stats(chunk_size, n_rep=8):
        draws = []
        for i in range(n_rep):
            draws.append(
                np.asarray(
                    pls.predict_samples(
                        particles=particles, x=x_test,
                        key=jax.random.key(200 + i), chunk_size=chunk_size,
                    )
                )
            )
        flat = np.concatenate(draws, axis=1)
        return flat.mean(axis=1), flat.var(axis=1)

    mean_full, var_full = stats(None)
    mean_chunk, var_chunk = stats(7)  # pad path: 7 does not divide 24
    scale = np.abs(mean_full).max() + 1.0
    np.testing.assert_allclose(mean_chunk, mean_full, atol=0.1 * scale)
    np.testing.assert_allclose(var_chunk, var_full, rtol=0.35, atol=0.02)


def test_sharded_chunked_serving_matches_single_device(trained):
    """The mesh-sharded chunked serving path (predict_samples(mesh=...))
    reproduces the single-device chunked path at the same block count up to
    compile-vs-eager float reassociation (the chunk axis is embarrassingly
    parallel and the per-chunk PRNG keys are the same split — same draws,
    ulp-level numerics). Block padding differs only when the serve axis does
    not divide the block count — so use a chunk size whose block count is
    already a multiple of the mesh size."""
    from projected_langevin_sampling_tpu.parallel import make_mesh

    pls, particles, x, y, z, a, rhs = trained
    x_test = jnp.asarray(np.linspace(-1.5, 1.5, 24)[:, None])
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    # chunk_size 6 -> 4 blocks == serve axis size: identical padding
    single = np.asarray(
        pls.predict_samples(
            particles=particles, x=x_test, key=jax.random.key(7), chunk_size=6
        )
    )
    sharded = np.asarray(
        pls.predict_samples(
            particles=particles, x=x_test, key=jax.random.key(7), chunk_size=6,
            mesh=mesh,
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-7, atol=1e-8)

    # non-dividing case: 24 points / chunk 7 -> 4 blocks -> padded to 4 (ok),
    # but with 3 devices it pads 4 -> 6 blocks; marginal law must still hold
    mesh3 = make_mesh(1, 2, devices=jax.devices()[:2])
    out = np.asarray(
        pls.predict_samples(
            particles=particles, x=x_test, key=jax.random.key(8), chunk_size=7,
            mesh=mesh3,
        )
    )
    assert out.shape == single.shape and np.all(np.isfinite(out))
