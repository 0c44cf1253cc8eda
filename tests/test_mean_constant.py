"""Prior mean constant m0 threading.

The latent is f(x) = m0 + sum_i phi_i(x) U_i with zero-mean coefficients U.
Core invariant (identity-link Gaussian cost, any basis, any tier): the model
(y, m0) is EXACTLY the shifted model (y - m0, 0) in coefficient space — same
particles for the same keys, predictions shifted by +m0, energies identical.
For non-Gaussian costs the derivative must be evaluated at F + m0 (no target
shift exists); tested directly against the closed forms.

The reference has no PLS prior mean (its GP baselines learn a ConstantMean,
``experiments/constructors.py:44-53``, which the harness hands to SVGP only),
so mean_constant=0.0 is reference parity and every nonzero case here is
new-capability coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import SigmoidLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import (
    _train_pls_scan,
    ipb_w_space_view,
    train_pls,
)
from projected_langevin_sampling_tpu.utils.prng import as_key

M0 = -2.75


def _data(seed=0, n=32, m=8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    base = ARDKernel(lengthscales=jnp.asarray([0.4]), outputscale=jnp.asarray(1.0))
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    return x, y, kernel, z


def _onb(kernel, z, x, mean_constant=0.0, scaling="reference"):
    return build_orthonormal_basis(
        kernel, z, x, eigenvalue_threshold=1e-2, verbose=False,
        scaling=scaling, mean_constant=mean_constant,
    )


def _ipb(kernel, z, x, y_induce, mean_constant=0.0):
    return build_inducing_point_basis(
        kernel, z, y_induce, x, mean_constant=mean_constant
    )


@pytest.mark.parametrize("which", ["onb", "ipb"])
@pytest.mark.parametrize("tier", ["off", "quadratic", "spectral"])
def test_gaussian_shift_equivalence(which, tier):
    """(y, m0) == (y - m0, 0) exactly: same particles, same energies."""
    x, y, kernel, z = _data()
    y_induce = jnp.asarray(np.sin(2 * np.linspace(-2, 2, 8)))
    if which == "onb":
        shifted = _onb(kernel, z, x, mean_constant=M0)
        centred = _onb(kernel, z, x, mean_constant=0.0)
    else:
        shifted = _ipb(kernel, z, x, y_induce, mean_constant=M0)
        centred = _ipb(kernel, z, x, y_induce - M0, mean_constant=0.0)
    cost_a = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    cost_b = GaussianCost(y_train=y - M0, observation_noise=jnp.asarray(0.1))
    particles = shifted.initialise_particles(12, key=0)
    key = as_key(3)
    a = _train_pls_scan(shifted, cost_a, particles, key, 1e-3, float("inf"), 30, tier)
    b = _train_pls_scan(centred, cost_b, particles, key, 1e-3, float("inf"), 30, tier)
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(a.energies), np.asarray(b.energies), rtol=1e-8, atol=1e-10
    )


def test_tiers_agree_with_mean_constant():
    """quadratic tier must reproduce the off tier trajectory exactly with
    m0 != 0 (the y_eff folding vs the facade's F + m0 path)."""
    x, y, kernel, z = _data()
    basis = _onb(kernel, z, x, mean_constant=M0)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    particles = basis.initialise_particles(12, key=0)
    key = as_key(7)
    fast = _train_pls_scan(basis, cost, particles, key, 1e-3, float("inf"), 30, "quadratic")
    slow = _train_pls_scan(basis, cost, particles, key, 1e-3, float("inf"), 30, "off")
    np.testing.assert_allclose(
        np.asarray(fast.particles), np.asarray(slow.particles), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(fast.energies), np.asarray(slow.energies), rtol=1e-8, atol=1e-10
    )


def test_facade_quantities_shift():
    """Cost derivative is evaluated at F + m0; predictions gain +m0 with the
    same injected predictive noise; energy matches the manual composition."""
    x, y, kernel, z = _data()
    basis0 = _onb(kernel, z, x, mean_constant=0.0)
    basis = _onb(kernel, z, x, mean_constant=M0)
    cost = BernoulliCost(
        y_train=(y > 0).astype(y.dtype), link_function=SigmoidLinkFunction()
    )
    pls0 = PLS(basis=basis0, cost=cost)
    pls = PLS(basis=basis, cost=cost)
    u = basis.initialise_particles(6, key=1)

    f0 = basis0.calculate_untransformed_train_prediction_samples(u)
    f = basis.calculate_untransformed_train_prediction_samples(u)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0) + M0, rtol=1e-12)

    dc = pls.calculate_cost_derivative(u)
    dc_manual = cost.calculate_cost_derivative(f0 + M0)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_manual), rtol=1e-12)

    # energy: cost at shifted predictions + unchanged coefficient prior
    e = float(pls.calculate_energy_potential(u))
    e_manual = float(
        basis0.calculate_energy_potential(u, cost.calculate_cost(f0 + M0))
    )
    assert e == pytest.approx(e_manual, rel=1e-12)

    # prediction with identical injected noise shifts by exactly m0
    x_test = jnp.asarray(np.linspace(-1.5, 1.5, 9)[:, None])
    noise = pls0.sample_predictive_noise(particles=u, x=x_test, key=11)
    p0 = basis0.predict_untransformed_samples(particles=u, x=x_test, noise=noise)
    p = basis.predict_untransformed_samples(particles=u, x=x_test, noise=noise)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0) + M0, rtol=1e-9, atol=1e-12)


def test_ipb_prediction_shift():
    x, y, kernel, z = _data()
    y_induce = jnp.asarray(np.sin(2 * np.linspace(-2, 2, 8)))
    basis0 = _ipb(kernel, z, x, y_induce, mean_constant=0.0)
    basis = _ipb(kernel, z, x, y_induce, mean_constant=M0)
    u = basis.initialise_particles(6, key=1)
    x_test = jnp.asarray(np.linspace(-1.5, 1.5, 9)[:, None])
    noise = basis0.sample_predictive_noise(particles=u, x=x_test, key=11)
    p0 = basis0.predict_untransformed_samples(particles=u, x=x_test, noise=noise)
    p = basis.predict_untransformed_samples(particles=u, x=x_test, noise=noise)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0) + M0, rtol=1e-9, atol=1e-12)
    # y-recentred init centres on the CENTRED latent values
    init0 = basis0.initialise_particles(5, noise_only=False, key=2)
    init = basis.initialise_particles(5, noise_only=False, key=2)
    np.testing.assert_allclose(np.asarray(init0 - init), np.full((8, 5), M0), rtol=1e-12)


@pytest.mark.parametrize("discretisation", ["exponential", "preconditioned"])
def test_split_schemes_shift_equivalence(discretisation):
    """The non-Euler schemes evaluate dc at F + m0 through the basis method:
    shift equivalence must hold for the Gaussian cost there too."""
    x, y, kernel, z = _data()
    shifted = _onb(kernel, z, x, mean_constant=M0, scaling="nystrom")
    centred = _onb(kernel, z, x, mean_constant=0.0, scaling="nystrom")
    cost_a = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    cost_b = GaussianCost(y_train=y - M0, observation_noise=jnp.asarray(0.1))
    particles = shifted.initialise_particles(12, key=0)
    key = as_key(5)
    a = _train_pls_scan(
        shifted, cost_a, particles, key, 1e-3, float("inf"), 30, "off",
        discretisation=discretisation,
    )
    b = _train_pls_scan(
        centred, cost_b, particles, key, 1e-3, float("inf"), 30, "off",
        discretisation=discretisation,
    )
    np.testing.assert_allclose(
        np.asarray(a.particles), np.asarray(b.particles), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(a.energies), np.asarray(b.energies), rtol=1e-8, atol=1e-10
    )


def test_precond_spectral_shift_equivalence():
    """The preconditioned SPECTRAL tier folds m0 into y_eff inside the host
    spectral system — must match the off-tier law; check against the shifted
    model exactly (same tier, same keys)."""
    x, y, kernel, z = _data()
    shifted = _onb(kernel, z, x, mean_constant=M0, scaling="nystrom")
    centred = _onb(kernel, z, x, mean_constant=0.0, scaling="nystrom")
    cost_a = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    cost_b = GaussianCost(y_train=y - M0, observation_noise=jnp.asarray(0.1))
    particles = shifted.initialise_particles(12, key=0)
    pa, ea = train_pls(
        PLS(basis=shifted, cost=cost_a), particles, 30, 1e-3, seed=9,
        fast_path="spectral", discretisation="preconditioned",
    )
    pb, eb = train_pls(
        PLS(basis=centred, cost=cost_b), particles, 30, 1e-3, seed=9,
        fast_path="spectral", discretisation="preconditioned",
    )
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), rtol=1e-7, atol=1e-9)


def test_general_fused_kernel_mean_shift_interpret():
    """Interpret-mode fused kernel with zero noise: trajectory must equal the
    off tier's deterministic gradient flow with m0 != 0 (Bernoulli cost —
    the non-affine case where y-folding is impossible)."""
    from jax.experimental.pallas import tpu as pltpu

    from projected_langevin_sampling_tpu.ops.pallas.general_train import (
        general_train_fused,
    )

    x, y, kernel, z = _data()
    basis = _onb(kernel, z, x, mean_constant=M0)
    labels = (y > 0).astype(jnp.float32)
    cost = BernoulliCost(y_train=labels, link_function=SigmoidLinkFunction())
    u0 = basis.initialise_particles(8, key=0).astype(jnp.float32)
    steps = 12
    with pltpu.force_tpu_interpret_mode():
        u_fused, energies = general_train_fused(
            basis.train_projection.astype(jnp.float32),
            u0,
            labels,
            basis.eigenvalues.astype(jnp.float32),
            "bernoulli_sigmoid",
            seed=0,
            eta=1e-2,
            patience=jnp.inf,
            num_steps=steps,
            mean_shift=M0,
            zero_noise=True,
        )
    # manual deterministic gradient flow through the basis method (evaluates
    # dc at F + m0)
    u = u0
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    basis64 = jax.tree.map(lambda l: l.astype(f64) if hasattr(l, "astype") else l, basis)
    u = u0.astype(f64)
    for _ in range(steps):
        f = basis64.calculate_untransformed_train_prediction_samples(u)
        dc = cost.calculate_cost_derivative(f)
        u = u - 1e-2 * (
            basis64.train_projection.T @ dc + u / basis64.eigenvalues[:, None]
        )
    np.testing.assert_allclose(
        np.asarray(u_fused), np.asarray(u), rtol=2e-2, atol=2e-3
    )


def test_ipb_w_space_view_carries_mean():
    x, y, kernel, z = _data()
    y_induce = jnp.asarray(np.sin(2 * np.linspace(-2, 2, 8)))
    basis = _ipb(kernel, z, x, y_induce, mean_constant=M0)
    view, s, s_inv = ipb_w_space_view(basis)
    assert view.mean_constant == M0
    u = basis.initialise_particles(4, key=3)
    f_ipb = basis.calculate_untransformed_train_prediction_samples(u)
    f_view = view.calculate_untransformed_train_prediction_samples(s_inv @ u)
    np.testing.assert_allclose(np.asarray(f_ipb), np.asarray(f_view), rtol=1e-8, atol=1e-10)


def test_parallel_sharded_mean_constant():
    """Sharded trainer must evaluate dc at F + m0: exact parity with the
    single-device off tier under injected noise."""
    from jax.sharding import Mesh
    from projected_langevin_sampling_tpu.parallel.sharded import (
        parallel_langevin_steps_with_noise,
    )

    x, y, kernel, z = _data()
    basis = _onb(kernel, z, x, mean_constant=M0)
    labels = (y > 0).astype(y.dtype)
    cost = BernoulliCost(y_train=labels, link_function=SigmoidLinkFunction())
    u0 = basis.initialise_particles(8, key=0)
    steps, eta = 10, 1e-2
    noise = jax.random.normal(
        as_key(4), (steps, basis.approximation_dimension, 8), dtype=u0.dtype
    )
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "particles"))
    u_par = parallel_langevin_steps_with_noise(mesh, basis, cost, u0, noise, eta)
    u = u0
    for t in range(steps):
        f = basis.calculate_untransformed_train_prediction_samples(u)
        dc = cost.calculate_cost_derivative(f)
        u = basis._calculate_particle_update(
            particles=u, cost_derivative=dc, step_size=eta, noise=noise[t]
        ) + u
    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u), rtol=1e-9, atol=1e-11)


# ---------------------------------------------------------------------------
# Empirical-Bayes MAP fit of m0 (models/mean_constant.py)
# ---------------------------------------------------------------------------
def test_fit_mean_constant_map_gaussian_closed_form():
    """Identity-link Gaussian cost: the joint MAP over [m0; u] is a quadratic
    programme with a closed-form solution — the fitter must recover it."""
    from projected_langevin_sampling_tpu.models.mean_constant import (
        fit_mean_constant_map,
    )

    x, y, kernel, z = _data()
    basis = _onb(kernel, z, x, scaling="nystrom")
    sigma2 = 0.3
    cost = GaussianCost(y_train=y, observation_noise=sigma2)
    m0 = fit_mean_constant_map(basis=basis, cost=cost)
    # closed form: minimise ||[1 B][m0;u] - y||^2/(2 s) + u^T L^-1 u / 2
    B = np.asarray(basis.train_projection, np.float64)
    lam = np.asarray(basis.eigenvalues, np.float64)
    A = np.concatenate([np.ones((B.shape[0], 1)), B], axis=1)
    prec = np.diag(np.concatenate([[0.0], 1.0 / lam]))
    w = np.linalg.solve(A.T @ A / sigma2 + prec, A.T @ np.asarray(y, np.float64) / sigma2)
    np.testing.assert_allclose(m0, w[0], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_fit_mean_constant_map_bernoulli_stationary(which):
    """Bernoulli/sigmoid: the fitted [m0; u*] must be a stationary point of
    the penalised objective (gradient ~ 0), and the fitted m0 must beat m0=0
    on the penalised optimum (it strictly enlarges the feasible set)."""
    from projected_langevin_sampling_tpu.models.mean_constant import (
        fit_mean_constant_map,
    )

    x, y, kernel, z = _data(seed=3)
    # imbalanced labels => the optimal constant is clearly nonzero
    labels = (np.asarray(y) > -0.8).astype(np.float64)
    labels = jnp.asarray(labels)
    if which == "onb":
        basis = _onb(kernel, z, x, scaling="nystrom")
    else:
        y_induce = labels[:: max(1, x.shape[0] // z.shape[0])][: z.shape[0]]
        basis = _ipb(kernel, z, x, y_induce=y_induce)
    cost = BernoulliCost(y_train=labels, link_function=SigmoidLinkFunction())
    m0 = fit_mean_constant_map(basis=basis, cost=cost)
    assert np.isfinite(m0) and m0 != 0.0

    def objective(w):
        f = basis.calculate_untransformed_train_prediction_samples(w[1:, None]) + w[0]
        return jnp.sum(cost.calculate_cost(f)) + basis.calculate_energy_potential(
            particles=w[1:, None], cost=jnp.zeros((1,), f.dtype)
        )

    # refit u at the returned m0 by Newton to get the joint stationary point
    grad = jax.grad(objective)
    hess = jax.hessian(objective)
    w = jnp.zeros(basis.approximation_dimension + 1, basis.dtype).at[0].set(m0)
    for _ in range(50):
        w = w - jnp.linalg.solve(
            hess(w) + 1e-10 * jnp.eye(w.shape[0], dtype=w.dtype), grad(w)
        )
    g = np.asarray(grad(w))
    assert np.max(np.abs(g)) < 1e-5
    # the m0 component of the joint gradient must vanish at the returned m0
    assert abs(float(w[0]) - m0) < 1e-4 * max(1.0, abs(m0))


@pytest.mark.parametrize("family", ["gaussian", "bernoulli", "smoothed"])
def test_fit_mean_constant_map_analytic_hessian_matches_autograd(family):
    """The fitter's analytic Hessian H = b_aug^T diag(c''(f)) b_aug +
    blockdiag(0, P) relies on the prediction map being linear, the prior
    quadratic, and every cost's f-Hessian diagonal (per-point sums). Pin all
    three against jax.hessian of the exact objective at a random w."""
    from projected_langevin_sampling_tpu.models.costs import (
        make_smoothed_bernoulli_cost,
        residual_smoothing_std,
    )

    x, y, kernel, z = _data(seed=5)
    basis = _onb(kernel, z, x, scaling="nystrom")
    labels = (y > 0).astype(y.dtype)
    if family == "gaussian":
        cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.25))
    elif family == "bernoulli":
        cost = BernoulliCost(y_train=labels, link_function=SigmoidLinkFunction())
    else:
        cost = make_smoothed_bernoulli_cost(
            y_train=labels,
            smoothing_std=residual_smoothing_std(basis, kernel(x, x, diag=True)),
        )

    def predict(u):
        return basis.calculate_untransformed_train_prediction_samples(u[:, None])[:, 0]

    def data_sum(f):
        return jnp.sum(cost.calculate_cost(f[:, None]))

    def prior_only(u):
        return basis.calculate_energy_potential(
            particles=u[:, None], cost=jnp.zeros((1,), dtype=u.dtype)
        )

    def objective(w):
        return data_sum(predict(w[1:]) + w[0]) + prior_only(w[1:])

    m_k = basis.approximation_dimension
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.normal(scale=0.3, size=m_k + 1), basis.dtype)

    zeros_u = jnp.zeros(m_k, dtype=basis.dtype)
    j_u = jax.jacfwd(predict)(zeros_u)
    b_aug = jnp.concatenate([jnp.ones((j_u.shape[0], 1), basis.dtype), j_u], axis=1)
    prior_block = (
        jnp.zeros((m_k + 1, m_k + 1), basis.dtype)
        .at[1:, 1:]
        .set(jax.hessian(prior_only)(zeros_u))
    )
    f = b_aug @ w
    h = jax.grad(lambda fv: jnp.sum(jax.grad(data_sum)(fv)))(f)
    analytic = b_aug.T @ (h[:, None] * b_aug) + prior_block
    autograd = jax.hessian(objective)(w)
    np.testing.assert_allclose(
        np.asarray(analytic), np.asarray(autograd), rtol=1e-8, atol=1e-10
    )


def test_fit_mean_constant_map_smoothed_cost_stationary():
    """End-to-end fit with the residual-smoothed cost (exercises the analytic
    Hessian through the quadrature): the returned m0 must be a stationary
    point of the joint objective in its m0 component."""
    from projected_langevin_sampling_tpu.models.costs import (
        make_smoothed_bernoulli_cost,
        residual_smoothing_std,
    )
    from projected_langevin_sampling_tpu.models.mean_constant import (
        fit_mean_constant_map,
    )

    x, y, kernel, z = _data(seed=3)
    basis = _onb(kernel, z, x, scaling="nystrom")
    labels = (np.asarray(y) > -0.8).astype(np.float64)
    cost = make_smoothed_bernoulli_cost(
        y_train=jnp.asarray(labels),
        smoothing_std=residual_smoothing_std(basis, kernel(x, x, diag=True)),
    )
    m0 = fit_mean_constant_map(basis=basis, cost=cost)
    assert np.isfinite(m0) and m0 != 0.0

    def objective(w):
        f = basis.calculate_untransformed_train_prediction_samples(w[1:, None]) + w[0]
        return jnp.sum(cost.calculate_cost(f)) + basis.calculate_energy_potential(
            particles=w[1:, None], cost=jnp.zeros((1,), f.dtype)
        )

    grad = jax.grad(objective)
    hess = jax.hessian(objective)
    w = jnp.zeros(basis.approximation_dimension + 1, basis.dtype).at[0].set(m0)
    for _ in range(50):
        w = w - jnp.linalg.solve(
            hess(w) + 1e-10 * jnp.eye(w.shape[0], dtype=w.dtype), grad(w)
        )
    assert np.max(np.abs(np.asarray(grad(w)))) < 1e-5
    assert abs(float(w[0]) - m0) < 1e-4 * max(1.0, abs(m0))


def test_fit_mean_constant_map_nonfinite_start_raises():
    """A non-finite objective at the zero start means the cost/label
    configuration is invalid — fail loudly instead of silently fitting 0."""
    from projected_langevin_sampling_tpu.models.mean_constant import (
        fit_mean_constant_map,
    )

    x, y, kernel, z = _data()
    basis = _onb(kernel, z, x, scaling="nystrom")
    bad = GaussianCost(
        y_train=y.at[0].set(jnp.inf), observation_noise=jnp.asarray(0.1)
    )
    with pytest.raises(ValueError, match="non-finite"):
        fit_mean_constant_map(basis=basis, cost=bad)


def test_fit_mean_constant_map_poisson_square_link():
    """The Poisson SQUARE link is singular at f=0 (-2 y log|f|): the zero
    start must fail loudly, and a nonzero ``initial_constant`` (sqrt of the
    mean count — reverting to the empirical mean rate) must converge to an
    m0 whose squared value tracks the mean rate of the data."""
    from projected_langevin_sampling_tpu.models.costs import PoissonCost
    from projected_langevin_sampling_tpu.models.link_functions import (
        SquareLinkFunction,
    )
    from projected_langevin_sampling_tpu.models.mean_constant import (
        fit_mean_constant_map,
    )

    rng = np.random.default_rng(0)
    x, _, kernel, z = _data()
    basis = _onb(kernel, z, x)
    n = x.shape[0]
    y = jnp.asarray(rng.poisson(6.0, size=n).astype(np.float64))
    cost = PoissonCost(y_train=y, link_function=SquareLinkFunction())

    with pytest.raises(ValueError, match="non-finite"):
        fit_mean_constant_map(basis=basis, cost=cost)

    m0 = fit_mean_constant_map(
        basis=basis, cost=cost,
        initial_constant=float(np.sqrt(float(y.mean()) + 0.5)),
    )
    assert np.isfinite(m0)
    # rate reverts to ~ the empirical mean count at the prior mean
    assert abs(m0**2 - float(y.mean())) / float(y.mean()) < 0.5
