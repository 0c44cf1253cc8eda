"""Basis tests (reference ``tests/test_basis.py`` coverage): eigenvalue
thresholding, particle init, update math against hand-computed expressions,
energy, and prediction shapes. Golden values are computed from the defining
formulas with numpy (the reference's torch-PRNG goldens cannot port — §4 of
SURVEY.md — so determinism is pinned via explicit noise injection instead)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.basis.noise_distributions import (
    StudentTPredictiveNoise,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel, ard_gram

M, N, J, D = 8, 20, 5, 2


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    x_train = jnp.asarray(rng.normal(size=(N, D)))
    x_induce = x_train[:M]
    y_induce = jnp.asarray(rng.normal(size=M))
    base = ARDKernel(lengthscales=jnp.asarray([1.0, 1.5]), outputscale=jnp.asarray(1.2))
    kernel = PLSKernel(base_kernel=base, approximation_samples=x_train)
    return x_train, x_induce, y_induce, kernel


def test_onb_build_eigendecomposition(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    k_zz = np.asarray(ard_gram(kernel.base_kernel, x_induce, x_induce))
    lam, v = np.linalg.eigh(k_zz / M)
    keep = lam > 0
    np.testing.assert_allclose(np.asarray(onb.eigenvalues), lam[keep], rtol=1e-10)
    m_k = keep.sum()
    assert onb.approximation_dimension == m_k
    # Vt columns scaled by 1/sqrt(M_k * lambda)
    expected_vt = v[:, keep] / np.sqrt(m_k * lam[keep])[None, :]
    np.testing.assert_allclose(
        np.abs(np.asarray(onb.scaled_eigenvectors)), np.abs(expected_vt), rtol=1e-8
    )


def test_onb_eigenvalue_threshold_reduces_dimension(setup):
    x_train, x_induce, _, kernel = setup
    onb_all = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    big = float(np.asarray(onb_all.eigenvalues)[-2])  # second-largest
    onb_cut = build_orthonormal_basis(
        kernel, x_induce, x_train, eigenvalue_threshold=big, verbose=False
    )
    assert onb_cut.approximation_dimension == 1


def test_onb_train_prediction_definition(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    u = jnp.asarray(np.random.default_rng(1).normal(size=(onb.approximation_dimension, J)))
    pred = onb.calculate_untransformed_train_prediction_samples(u)
    k_zx = np.asarray(onb.base_gram_induce_train)
    expected = k_zx.T @ np.asarray(onb.scaled_eigenvectors) @ np.asarray(u)
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=1e-8)


def test_onb_update_matches_formula(setup):
    """-eta Vt^T k(Z,X) dc - eta Lambda^{-1} U + sqrt(2 eta) eps (orthonormal.py:128-159)."""
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    m_k = onb.approximation_dimension
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(m_k, J)))
    dc = jnp.asarray(rng.normal(size=(N, J)))
    eps = jnp.asarray(rng.normal(size=(m_k, J)))
    eta = 0.01
    update = onb.calculate_particle_update(u, dc, eta, noise=eps)
    vt = np.asarray(onb.scaled_eigenvectors)
    k_zx = np.asarray(onb.base_gram_induce_train)
    lam = np.asarray(onb.eigenvalues)
    expected = (
        -eta * vt.T @ k_zx @ np.asarray(dc)
        - eta * np.diag(1 / lam) @ np.asarray(u)
        + np.sqrt(2 * eta) * np.asarray(eps)
    )
    np.testing.assert_allclose(np.asarray(update), expected, rtol=1e-8, atol=1e-12)


def test_onb_energy_potential(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    m_k = onb.approximation_dimension
    rng = np.random.default_rng(3)
    u = rng.normal(size=(m_k, J))
    cost = rng.normal(size=J)
    energy = onb.calculate_energy_potential(jnp.asarray(u), jnp.asarray(cost))
    lam = np.asarray(onb.eigenvalues)
    expected = (cost + 0.5 * (u * (np.diag(1 / lam) @ u)).sum(axis=0)).mean()
    np.testing.assert_allclose(float(energy), expected, rtol=1e-10)


def test_onb_rejects_noise_only_false(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    with pytest.raises(ValueError):
        onb.initialise_particles(J, noise_only=False)


def test_onb_particle_init_shape_and_determinism(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    p1 = onb.initialise_particles(J, key=42)
    p2 = onb.initialise_particles(J, key=42)
    assert p1.shape == (onb.approximation_dimension, J)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_ipb_build_and_train_prediction(setup):
    x_train, x_induce, y_induce, kernel = setup
    ipb = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    assert ipb.approximation_dimension == M
    u = jnp.asarray(np.random.default_rng(4).normal(size=(M, J)))
    pred = ipb.calculate_untransformed_train_prediction_samples(u)
    k_zz = np.asarray(ipb.base_gram_induce)
    k_zx = np.asarray(ipb.base_gram_induce_train)
    expected = k_zx.T @ np.linalg.solve(k_zz, np.asarray(u))
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=1e-6, atol=1e-9)


def test_ipb_update_matches_formula(setup):
    """-eta k(Z,X) dc - eta M k(Z,Z)^{-1} U + sqrt(2 eta) e (inducing_point.py:117-150)."""
    x_train, x_induce, y_induce, kernel = setup
    ipb = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(M, J)))
    dc = jnp.asarray(rng.normal(size=(N, J)))
    e = jnp.asarray(rng.normal(size=(M, J)))
    eta = 0.01
    update = ipb.calculate_particle_update(u, dc, eta, noise=e)
    k_zz = np.asarray(ipb.base_gram_induce)
    k_zx = np.asarray(ipb.base_gram_induce_train)
    expected = (
        -eta * k_zx @ np.asarray(dc)
        - eta * M * np.linalg.solve(k_zz, np.asarray(u))
        + np.sqrt(2 * eta) * np.asarray(e)
    )
    np.testing.assert_allclose(np.asarray(update), expected, rtol=1e-5, atol=1e-8)


def test_ipb_energy_potential(setup):
    x_train, x_induce, y_induce, kernel = setup
    ipb = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    rng = np.random.default_rng(6)
    u = rng.normal(size=(M, J))
    cost = rng.normal(size=J)
    energy = ipb.calculate_energy_potential(jnp.asarray(u), jnp.asarray(cost))
    kinv_u = np.linalg.solve(np.asarray(ipb.base_gram_induce), u)
    expected = (cost + M / 2 * np.square(kinv_u).sum(axis=0)).mean()
    np.testing.assert_allclose(float(energy), expected, rtol=1e-4)


def test_ipb_init_with_y_induce(setup):
    x_train, x_induce, y_induce, kernel = setup
    ipb = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    noise = ipb._initialise_particles_noise(J, key=0)
    with_y = ipb.initialise_particles(J, noise_only=False, key=0)
    np.testing.assert_allclose(
        np.asarray(with_y), np.asarray(y_induce)[:, None] + np.asarray(noise), rtol=1e-12
    )


def test_ipb_update_noise_covariance(setup):
    x_train, x_induce, y_induce, kernel = setup
    ipb = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    e = ipb.sample_update_noise(100_000, key=jax.random.key(0))
    emp_cov = np.cov(np.asarray(e))
    np.testing.assert_allclose(
        emp_cov, np.asarray(ipb.base_gram_induce), atol=0.05
    )


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_predictive_paths_shapes(setup, which):
    x_train, x_induce, y_induce, kernel = setup
    if which == "onb":
        basis = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    else:
        basis = build_inducing_point_basis(kernel, x_induce, y_induce, x_train)
    m = basis.approximation_dimension
    u = jnp.asarray(np.random.default_rng(7).normal(size=(m, J)))
    x_test = jnp.asarray(np.random.default_rng(8).normal(size=(4, D)))
    noise = basis.sample_predictive_noise(u, x_test, key=0)
    assert noise.shape == (m + 4, J)
    pred = basis.predict_untransformed_samples(u, x_test, noise=noise)
    assert pred.shape == (4, J)
    # with injected noise the prediction is deterministic
    pred2 = basis.predict_untransformed_samples(u, x_test, noise=noise)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred2))


def test_onb_pathwise_conditioning_formula(setup):
    x_train, x_induce, _, kernel = setup
    onb = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    m_k = onb.approximation_dimension
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.normal(size=(m_k, J)))
    x_test = jnp.asarray(rng.normal(size=(4, D)))
    noise = jnp.asarray(rng.normal(size=(m_k + 4, J)))
    pred = onb.predict_untransformed_samples(u, x_test, noise=noise)
    k_x_induce = np.asarray(ard_gram(kernel.base_kernel, x_test, x_induce))
    expected = np.asarray(noise)[m_k:] + k_x_induce @ np.asarray(
        onb.scaled_eigenvectors
    ) @ (np.asarray(u) - np.asarray(noise)[:m_k])
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=1e-8)


def test_additional_predictive_noise_applied(setup):
    x_train, x_induce, _, kernel = setup
    heavy = StudentTPredictiveNoise(df=3.0, scale=0.5)
    onb_plain = build_orthonormal_basis(kernel, x_induce, x_train, verbose=False)
    onb_heavy = build_orthonormal_basis(
        kernel, x_induce, x_train,
        additional_predictive_noise_distribution=heavy, verbose=False,
    )
    m_k = onb_plain.approximation_dimension
    u = jnp.zeros((m_k, J))
    x_test = x_train[:3]
    n_plain = onb_plain.sample_predictive_noise(u, x_test, key=0)
    n_heavy = onb_heavy.sample_predictive_noise(u, x_test, key=0)
    assert not np.allclose(np.asarray(n_plain), np.asarray(n_heavy))
