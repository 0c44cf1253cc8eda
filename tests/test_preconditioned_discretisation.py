"""Lambda-preconditioned ("preconditioned") Langevin discretisation.

The constant-metric (Riemannian) Langevin dU = -Lambda grad E dt
+ sqrt(2 Lambda) dW has the SAME stationary density exp(-E) as the plain
chain for any constant SPD preconditioner. Discretised as an explicit data
sub-step U -> U - eta Lambda B^T dc(B U) followed by the EXACT prior+noise
OU flow U -> e^{-eta} U + sqrt(lambda (1 - e^{-2 eta})) eps:

  * prior stiffness becomes 1 (unconditionally stable);
  * data-term curvature becomes Lambda^{1/2} B^T H B Lambda^{1/2} — under
    the nystrom ONB scaling this equals the REFERENCE-scaled curvature (up
    to sqrt(M_k/M)), restoring the reference protocol's step grid.

This is the stable data-term discretisation that makes the nystrom scaling
usable for non-Gaussian costs (docs/DESIGN.md §4; round-2 VERDICT item 1).
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
from projected_langevin_sampling_tpu.training import (
    _train_pls_scan,
    ipb_w_space_view,
    spectral_system_host,
    train_pls,
)
from projected_langevin_sampling_tpu.utils.prng import as_key


def _problem(scaling="reference", seed=0, n=60, m=12):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0))
    f = np.sin(2 * np.asarray(x)[:, 0])
    y = jnp.asarray(f + 0.15 * rng.normal(size=n))
    kernel = ARDKernel(lengthscales=jnp.asarray([0.8]), outputscale=jnp.asarray(1.0))
    z = jnp.asarray(np.linspace(-2.9, 2.9, m)[:, None])
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    basis = build_orthonormal_basis(pls_kernel, z, x, verbose=False, scaling=scaling)
    return basis, y


def _precond_stationary_mean(basis, y, noise, eta):
    """Closed-form stationary mean of the preconditioned split scheme for the
    Gaussian-identity cost: mu = d (mu - eta Lam (G mu - b)), d = e^{-eta}."""
    b_mat = np.asarray(basis.train_projection, dtype=np.float64)
    lam = np.asarray(basis.eigenvalues, dtype=np.float64)
    g = b_mat.T @ b_mat / noise
    rhs = b_mat.T @ np.asarray(y, np.float64) / noise
    d = np.exp(-eta)
    a = np.eye(lam.size) - d * (np.eye(lam.size) - eta * lam[:, None] * g)
    return np.linalg.solve(a, eta * d * lam * rhs)


@pytest.mark.parametrize("scaling", ["reference", "nystrom"])
def test_preconditioned_matches_closed_form_gaussian(scaling):
    basis, y = _problem(scaling=scaling)
    noise = 0.15**2
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise), y_train=y,
        link_function=IdentityLinkFunction(),
    )
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(1024, seed=0)
    eta = 2e-3
    trained, energies = train_pls(
        pls, particles, 8000, eta, key=1, discretisation="preconditioned",
        fast_path="off",
    )
    assert energies[-1] < energies[0]
    mu = _precond_stationary_mean(basis, y, noise, eta)
    b_mat = np.asarray(basis.train_projection, dtype=np.float64)
    pred_hat = b_mat @ np.asarray(trained, np.float64).mean(axis=1)
    pred = b_mat @ mu
    assert np.abs(pred_hat - pred).max() < 0.1 * (np.abs(pred).max() + 1e-6)


def test_preconditioned_spectral_matches_off_law():
    """Gaussian-identity: the preconditioned SPECTRAL tier evolves the same
    chain in rotated coordinates — identical LAW to the off tier (particle
    mean agrees; the closed-form stationary mean pins both)."""
    basis, y = _problem(scaling="nystrom")
    noise = 0.15**2
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise), y_train=y,
        link_function=IdentityLinkFunction(),
    )
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(2048, seed=0)
    eta = 2e-3
    off, _ = train_pls(
        pls, particles, 6000, eta, key=1, discretisation="preconditioned",
        fast_path="off",
    )
    spec, _ = train_pls(
        pls, particles, 6000, eta, key=2, discretisation="preconditioned",
        fast_path="spectral",
    )
    b_mat = np.asarray(basis.train_projection, dtype=np.float64)
    pred_off = b_mat @ np.asarray(off, np.float64).mean(axis=1)
    pred_spec = b_mat @ np.asarray(spec, np.float64).mean(axis=1)
    mu = b_mat @ _precond_stationary_mean(basis, y, noise, eta)
    scale = np.abs(mu).max() + 1e-6
    assert np.abs(pred_off - mu).max() < 0.1 * scale
    assert np.abs(pred_spec - mu).max() < 0.1 * scale


def test_preconditioned_spectral_system_consistency():
    """Host fp64 preconditioned system: q_out sigma q_in^T == Lambda A_d and
    the energy quadratic (sigma + 1) reproduces the facade's energy."""
    basis, y = _problem(scaling="nystrom")
    noise = 0.15**2
    cost = GaussianCost(
        observation_noise=jnp.asarray(noise), y_train=y,
        link_function=IdentityLinkFunction(),
    )
    sys = spectral_system_host(basis, cost, discretisation="preconditioned")
    b_mat = np.asarray(basis.train_projection, np.float64)
    lam = np.asarray(basis.eigenvalues, np.float64)
    a_d = b_mat.T @ b_mat / noise
    lhs = np.asarray(sys.q_out, np.float64) @ np.diag(
        np.asarray(sys.sigma, np.float64)
    ) @ np.asarray(sys.q_in, np.float64).T
    np.testing.assert_allclose(lhs, lam[:, None] * a_d, rtol=1e-8, atol=1e-8)

    # energy identity at random particles: W-space quadratic == facade energy
    rng = np.random.default_rng(0)
    u = rng.normal(size=(lam.size, 7))
    w = np.asarray(sys.q_in, np.float64).T @ u
    sigma = np.asarray(sys.sigma, np.float64)
    b_rot = np.asarray(sys.b_rot, np.float64)
    e_w = (
        0.5 * np.sum((sigma[:, None] + 1.0) * w**2, axis=0)
        - b_rot @ w
        + float(sys.e_const)
    ).mean()
    pls = PLS(basis=basis, cost=cost)
    e_facade = float(pls.calculate_energy_potential(jnp.asarray(u)))
    np.testing.assert_allclose(e_w, e_facade, rtol=1e-8)


def test_preconditioned_stable_under_nystrom_bernoulli_where_euler_diverges():
    """THE round-3 headline property: under the nystrom scaling +
    Bernoulli-sigmoid cost, explicit Euler diverges at the reference
    protocol's upper step size while the preconditioned chain is stable and
    reduces the energy."""
    basis, _ = _problem(scaling="nystrom", n=120, m=16)
    n = basis.train_projection.shape[0]
    y = jnp.asarray((np.sin(2 * np.linspace(-3, 3, n)) > 0).astype(float))
    cost = BernoulliCost(y_train=y, link_function=SigmoidLinkFunction())
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(128, seed=0)
    eta = 1e-3  # the reference protocol's step_size_upper
    initial_energy = float(pls.calculate_energy_potential(particles))
    euler, euler_energies = train_pls(
        pls, particles, 800, eta, key=1, fast_path="off", discretisation="euler",
    )
    pre, pre_energies = train_pls(
        pls, particles, 800, eta, key=1, discretisation="preconditioned",
    )
    euler_diverged = (
        not bool(jnp.isfinite(euler).all())
        or not euler_energies
        or euler_energies[-1] > initial_energy
    )
    assert euler_diverged, "expected Euler to be unstable at eta=1e-3 (nystrom)"
    assert bool(jnp.isfinite(pre).all())
    assert pre_energies[-1] < initial_energy
    assert pre_energies[-1] < pre_energies[0]


def test_preconditioned_agrees_with_euler_at_small_steps_bernoulli():
    """For steps small enough that Euler is stable, both discretisations
    sample the same posterior — compare predictive train probabilities."""
    basis, _ = _problem(scaling="reference")
    n = basis.train_projection.shape[0]
    y = jnp.asarray((np.sin(2 * np.linspace(-3, 3, n)) > 0).astype(float))
    cost = BernoulliCost(y_train=y, link_function=SigmoidLinkFunction())
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(2048, seed=0)
    lam_min = float(np.asarray(basis.eigenvalues).min())
    eta = 0.2 * lam_min
    steps = 4000
    pe, _ = train_pls(pls, particles, steps, eta, key=5, fast_path="off")
    pp, _ = train_pls(pls, particles, steps, eta, key=6, discretisation="preconditioned")
    prob_e = np.asarray(pls.predict(x=basis.x_induce, particles=pe, key=0).probs)
    prob_p = np.asarray(pls.predict(x=basis.x_induce, particles=pp, key=0).probs)
    np.testing.assert_allclose(prob_e, prob_p, atol=0.12)


def _ipb_problem():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (40, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=40))
    kernel = ARDKernel(lengthscales=jnp.asarray([0.6]), outputscale=jnp.asarray(1.0))
    z = jnp.asarray(np.linspace(-2, 2, 8)[:, None])
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    basis = build_inducing_point_basis(pls_kernel, z, jnp.sin(2 * z[:, 0]), x)
    return basis, x, y


def test_ipb_w_view_euler_trajectory_parity():
    """The W-space ONB view reproduces the native IPB Euler trajectory
    EXACTLY: U_t = S W_t for the same keys (the IPB update noise is S z with
    the same iid z the view draws)."""
    basis, x, y = _ipb_problem()
    cost = GaussianCost(observation_noise=jnp.asarray(0.04), y_train=y)
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(16, seed=0)
    view, s_mat, s_inv = ipb_w_space_view(basis)
    steps, eta = 50, 1e-3
    native = _train_pls_scan(
        basis, cost, u0, as_key(3), eta, float("inf"), steps, "off"
    )
    viewed = _train_pls_scan(
        view, cost, s_inv @ u0, as_key(3), eta, float("inf"), steps, "off"
    )
    np.testing.assert_allclose(
        np.asarray(s_mat @ viewed.particles),
        np.asarray(native.particles),
        rtol=1e-9,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(viewed.energies), np.asarray(native.energies), rtol=1e-9
    )


def test_ipb_preconditioned_and_exponential_run_via_view():
    """train_pls routes IPB through the W-space view for non-Euler
    discretisations: finite particles, decreasing energy, U-space output."""
    basis, x, y = _ipb_problem()
    n = y.shape[0]
    yb = jnp.asarray((np.asarray(y) > 0).astype(float))
    cost = BernoulliCost(y_train=yb, link_function=SigmoidLinkFunction())
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(64, seed=0)
    for disc in ("preconditioned", "exponential"):
        out, energies = train_pls(
            pls, u0, 500, 1e-2, key=2, discretisation=disc,
        )
        assert out.shape == u0.shape
        assert bool(jnp.isfinite(out).all())
        assert energies[-1] < energies[0]
        # outputs live in U space: the facade's energy at the returned
        # particles matches the last recorded W-space energy
        e_facade = float(pls.calculate_energy_potential(out))
        np.testing.assert_allclose(e_facade, energies[-1], rtol=1e-6)


def test_preconditioned_rejects_quadratic_tier():
    basis, y = _problem()
    cost = GaussianCost(observation_noise=jnp.asarray(0.04), y_train=y)
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(8, seed=0)
    with pytest.raises(ValueError):
        train_pls(pls, u0, 10, 1e-4, key=1, discretisation="preconditioned",
                  fast_path="quadratic")
    with pytest.raises(ValueError):
        _train_pls_scan(
            basis, cost, u0, as_key(1), 1e-4, float("inf"), 10, "quadratic",
            None, "preconditioned",
        )
