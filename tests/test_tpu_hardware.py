"""Hardware-lane tests (``PLS_TPU_TESTS=1 pytest -m tpu``): the fused
kernels' stochastic law on the REAL TPU PRNG.

The CPU lane runs every fused kernel in interpret mode, where
``pltpu.prng_random_bits`` yields zero noise — deterministic drift and
early-stop semantics are covered there, but nothing validates the noise
path. These tests close that gap: each fused tier and the XLA tier
implement the SAME Markov chain (law-equivalent per step), so after T
stable steps from the same initial particles their per-dimension particle
moments must agree to Monte-Carlo error — full stationarity is not
required, which keeps the step counts (and the chip time) small.

Round 2's ``test_stationary_law_matches_off_tier`` hard-coded eta=5e-3,
which DIVERGES for its own spectrum (energy → NaN by step ~7 in both tiers
— the kernel was faithful, the config was bad) and was CPU-skipped so it
never ran anywhere. Here every Euler step size is derived from the basis
spectrum (eta = 0.5·2·lam_min safety-factored below the prior stability
bound) and each test asserts finiteness before comparing moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import _train_pls_scan
from projected_langevin_sampling_tpu.utils.prng import as_key

pytestmark = pytest.mark.tpu

N, M, J = 50, 12, 512


def _setup(kind):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0), dtype=jnp.float32)
    f_true = np.sin(2 * np.asarray(x)[:, 0])
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.4], dtype=jnp.float32),
            outputscale=jnp.asarray(1.0, dtype=jnp.float32),
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, M)[:, None], dtype=jnp.float32)
    basis = build_orthonormal_basis(
        kernel, z, x, eigenvalue_threshold=1e-3, verbose=False
    )
    if kind == "gaussian":
        y = jnp.asarray(f_true + 0.1 * rng.normal(size=N), dtype=jnp.float32)
        cost = GaussianCost(
            y_train=y,
            observation_noise=jnp.asarray(0.1, jnp.float32),
            link_function=IdentityLinkFunction(),
        )
    elif kind == "bernoulli_smoothed":
        from projected_langevin_sampling_tpu.models.costs import (
            make_smoothed_bernoulli_cost,
        )

        y = jnp.asarray((f_true > 0).astype(np.float32))
        cost = make_smoothed_bernoulli_cost(
            y_train=y,
            smoothing_std=jnp.asarray(
                rng.uniform(0.1, 1.0, N).astype(np.float32)
            ),
        )
    elif kind == "multimodal":
        from projected_langevin_sampling_tpu.models.costs import MultiModalCost

        shift, w = 2.0, 0.4
        y = jnp.asarray(
            f_true - shift * (rng.uniform(size=N) < w) + 0.1 * rng.normal(size=N),
            dtype=jnp.float32,
        )
        cost = MultiModalCost(
            y_train=y,
            observation_noise=jnp.asarray(0.3, jnp.float32),
            shift=shift,
            bernoulli_noise=w,
        )
    else:  # bernoulli_sigmoid
        y = jnp.asarray((f_true > 0).astype(np.float32))
        cost = BernoulliCost(y_train=y)
    return basis, cost


def _stable_eta(basis, cost):
    """Half the explicit-Euler prior stability bound, shrunk further by the
    data-term curvature estimate (Gershgorin on P^T P / s)."""
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    p = np.asarray(basis.train_projection, dtype=np.float64)
    data_curv = np.abs(p.T @ p).sum(axis=1).max()
    if isinstance(cost, GaussianCost):
        data_curv /= float(np.asarray(cost.observation_noise))
    else:
        data_curv *= 0.25  # sigmoid Hessian bound
    return float(1.0 / (1.0 / lam.min() + data_curv))


def _moments(u):
    u = np.asarray(u, dtype=np.float64)
    return u.mean(axis=1), u.std(axis=1)


def _run(basis, cost, u0, eta, steps, tier, key, discretisation="euler"):
    result = _train_pls_scan(
        basis, cost, u0, as_key(key), eta, float("inf"), steps, tier,
        None, discretisation,
    )
    u = np.asarray(result.particles, dtype=np.float64)
    assert np.isfinite(u).all(), f"{tier} tier diverged at eta={eta}"
    return u


def _assert_law_matches(u_ref, u_test, label):
    mean_r, std_r = _moments(u_ref)
    mean_t, std_t = _moments(u_test)
    scale = np.abs(mean_r).max() + 1e-6
    np.testing.assert_allclose(
        mean_t, mean_r, atol=0.25 * max(scale, 1.0), err_msg=f"{label}: means"
    )
    np.testing.assert_allclose(
        std_t, std_r, rtol=0.5, atol=0.15, err_msg=f"{label}: stds"
    )


@pytest.fixture(autouse=True)
def _require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("hardware lane requires the TPU backend")


def test_general_fused_law_bernoulli_euler():
    basis, cost = _setup("bernoulli_sigmoid")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta = _stable_eta(basis, cost)
    steps = 2000
    u_xla = _run(basis, cost, u0, eta, steps, "off", key=7)
    u_fused = _run(basis, cost, u0, eta, steps, "general_fused", key=3)
    _assert_law_matches(u_xla, u_fused, "general_fused/bernoulli/euler")


def test_general_fused_law_bernoulli_preconditioned():
    """The round-3 stable discretisation, fused-vs-XLA on hardware noise."""
    basis, cost = _setup("bernoulli_sigmoid")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta, steps = 5e-3, 2000  # unconditionally prior-stable
    u_xla = _run(
        basis, cost, u0, eta, steps, "off", key=7, discretisation="preconditioned"
    )
    u_fused = _run(
        basis, cost, u0, eta, steps, "general_fused", key=3,
        discretisation="preconditioned",
    )
    _assert_law_matches(u_xla, u_fused, "general_fused/bernoulli/preconditioned")


def test_general_fused_law_bernoulli_smoothed_preconditioned():
    """The headline classification cost (residual-smoothed quadrature),
    fused-vs-XLA on hardware noise under the preconditioned scheme."""
    basis, cost = _setup("bernoulli_smoothed")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta, steps = 5e-3, 2000  # unconditionally prior-stable
    u_xla = _run(
        basis, cost, u0, eta, steps, "off", key=7, discretisation="preconditioned"
    )
    u_fused = _run(
        basis, cost, u0, eta, steps, "general_fused", key=3,
        discretisation="preconditioned",
    )
    _assert_law_matches(u_xla, u_fused, "general_fused/smoothed/preconditioned")


def test_general_fused_law_multimodal_preconditioned():
    """The round-4 fused mixture cost (closed-form responsibility-weighted
    gradient) vs the XLA autograd path on hardware noise."""
    basis, cost = _setup("multimodal")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta, steps = 5e-3, 2000  # unconditionally prior-stable
    u_xla = _run(
        basis, cost, u0, eta, steps, "off", key=7, discretisation="preconditioned"
    )
    u_fused = _run(
        basis, cost, u0, eta, steps, "general_fused", key=3,
        discretisation="preconditioned",
    )
    _assert_law_matches(u_xla, u_fused, "general_fused/multimodal/preconditioned")


def test_spectral_fused_law_gaussian():
    from projected_langevin_sampling_tpu.training import spectral_system_host

    basis, cost = _setup("gaussian")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta = _stable_eta(basis, cost)
    steps = 2000
    system = spectral_system_host(basis, cost)
    u_xla = _run(basis, cost, u0, eta, steps, "spectral", key=7)
    result = _train_pls_scan(
        basis, cost, u0, as_key(3), eta, float("inf"), steps, "spectral_fused",
        system, "euler",
    )
    u_fused = np.asarray(result.particles, dtype=np.float64)
    assert np.isfinite(u_fused).all()
    _assert_law_matches(u_xla, u_fused, "spectral_fused/gaussian")


def test_quadratic_fused_law_gaussian():
    basis, cost = _setup("gaussian")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta = _stable_eta(basis, cost)
    steps = 2000
    u_xla = _run(basis, cost, u0, eta, steps, "quadratic", key=7)
    u_fused = _run(basis, cost, u0, eta, steps, "quadratic_fused", key=3)
    _assert_law_matches(u_xla, u_fused, "quadratic_fused/gaussian")


def test_gaussian_stationary_moments_closed_form():
    """Long-run check against the EXACT discrete-chain stationary moments:
    for the Euler spectral chain w' = (1-eta s) w + eta b + sqrt(2 eta) eps
    the stationary mean is b/s and the variance 2/(s (2 - eta s)). The fused
    general kernel must land on the same law (Gaussian-identity cost)."""
    basis, cost = _setup("gaussian")
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    eta = _stable_eta(basis, cost)
    steps = 6000
    u = _run(basis, cost, u0, eta, steps, "general_fused", key=11)
    p = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    s_noise = float(np.asarray(cost.observation_noise))
    a = p.T @ p / s_noise + np.diag(1.0 / lam)
    b = p.T @ np.asarray(cost.y_train, np.float64) / s_noise
    sigma, q = np.linalg.eigh(a)
    mean_exact = q @ ((q.T @ b) / sigma)
    var_w = 2.0 / (sigma * (2.0 - eta * sigma))
    var_exact = (q**2 @ var_w)
    mean_hat, std_hat = _moments(u)
    scale = np.abs(mean_exact).max()
    np.testing.assert_allclose(mean_hat, mean_exact, atol=0.2 * scale)
    np.testing.assert_allclose(std_hat, np.sqrt(var_exact), rtol=0.35, atol=0.1)
