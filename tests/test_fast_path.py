"""Fast-path tiers: the quadratic tier must reproduce the general path's
trajectory exactly (same keys); the spectral tier must compute identical
energies for identical particles and the identical stationary law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import SquareLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import (
    _spectral_system,
    _train_pls_scan,
    langevin_steps,
    resolve_fast_path,
    train_pls,
)
from projected_langevin_sampling_tpu.utils.prng import as_key


def _setup(which="onb"):
    rng = np.random.default_rng(0)
    n, m = 32, 8
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    base = ARDKernel(lengthscales=jnp.asarray([0.4]), outputscale=jnp.asarray(1.0))
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    if which == "onb":
        basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    else:
        basis = build_inducing_point_basis(
            kernel, z, jnp.asarray(np.sin(2 * np.linspace(-2, 2, m))), x
        )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    return basis, cost


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_quadratic_matches_general_train(which):
    basis, cost = _setup(which)
    particles = basis.initialise_particles(16, key=0)
    key = as_key(3)
    fast = _train_pls_scan(basis, cost, particles, key, 1e-3, float("inf"), 40, "quadratic")
    slow = _train_pls_scan(basis, cost, particles, key, 1e-3, float("inf"), 40, "off")
    np.testing.assert_allclose(
        np.asarray(fast.particles), np.asarray(slow.particles), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(fast.energies), np.asarray(slow.energies), rtol=1e-8, atol=1e-10
    )


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_quadratic_matches_general_langevin_steps(which):
    basis, cost = _setup(which)
    particles = basis.initialise_particles(16, key=0)
    key = as_key(5)
    fast = langevin_steps(basis, cost, particles, key, 1e-3, 40, "quadratic")
    slow = langevin_steps(basis, cost, particles, key, 1e-3, 40, "off")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-9, atol=1e-11)


def test_tier_resolution():
    onb, cost = _setup("onb")
    ipb, _ = _setup("ipb")
    assert resolve_fast_path(onb, cost, "auto") == "spectral"
    # IPB+Gaussian diagonalises too (Cholesky change of variables)
    assert resolve_fast_path(ipb, cost, "auto") == "spectral"
    assert resolve_fast_path(ipb, cost, "spectral") == "spectral"
    bern = BernoulliCost(y_train=jnp.zeros(32))
    assert resolve_fast_path(onb, bern, "auto") == "off"
    nonlinear = GaussianCost(
        y_train=jnp.zeros(32),
        observation_noise=jnp.asarray(0.1),
        link_function=SquareLinkFunction(),
    )
    assert resolve_fast_path(onb, nonlinear, "auto") == "off"
    with pytest.raises(ValueError):
        resolve_fast_path(onb, bern, "spectral")
    with pytest.raises(ValueError):
        resolve_fast_path(onb, bern, "quadratic")


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_spectral_energy_identity(which):
    """For the SAME particles, the spectral energy formula must equal the
    facade's energy potential exactly (invariance of the quadratic forms
    under the rotation / the Cholesky change of variables)."""
    basis, cost = _setup(which)
    pls = PLS(basis=basis, cost=cost)
    sigma, q_in, q_out, b_rot, e_const = _spectral_system(basis, cost)
    u = jnp.asarray(
        np.random.default_rng(1).normal(size=(basis.approximation_dimension, 12))
    )
    w = q_in.T @ u
    energy_spectral = float(
        jnp.mean(
            0.5 * jnp.sum(sigma[:, None] * jnp.square(w), axis=0) - b_rot @ w + e_const
        )
    )
    energy_facade = float(pls.calculate_energy_potential(u))
    assert energy_spectral == pytest.approx(energy_facade, rel=1e-7)


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_spectral_matches_stationary_law(which):
    """Spectral and general paths share the stationary distribution: compare
    empirical moments of both chains against each other."""
    from projected_langevin_sampling_tpu.training import spectral_system_host

    basis, cost = _setup(which)
    sigma_sys = np.asarray(spectral_system_host(basis, cost).sigma, dtype=np.float64)
    eta = 0.5 / sigma_sys.max()
    steps = int(np.ceil(12.0 / (eta * sigma_sys.min())))
    j = 4000
    particles = basis.initialise_particles(j, key=0)
    u_spec = np.asarray(
        langevin_steps(basis, cost, particles, as_key(1), eta, steps, "spectral")
    )
    u_gen = np.asarray(
        langevin_steps(basis, cost, particles, as_key(2), eta, steps, "quadratic")
    )
    se = np.sqrt(np.diag(np.cov(u_gen)) / j)
    np.testing.assert_allclose(
        u_spec.mean(axis=1), u_gen.mean(axis=1), atol=6 * np.max(se) + 1e-3
    )
    np.testing.assert_allclose(
        np.diag(np.cov(u_spec)), np.diag(np.cov(u_gen)), rtol=0.3, atol=1e-6
    )


def test_fast_path_early_stopping_matches():
    basis, cost = _setup("onb")
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(16, key=0)
    step = 1e-3
    fast_p, fast_e = train_pls(
        pls, particles, 3000, step, early_stopper_patience=15 * step,
        key=as_key(7), fast_path="quadratic",
    )
    slow_p, slow_e = train_pls(
        pls, particles, 3000, step, early_stopper_patience=15 * step,
        key=as_key(7), fast_path="off",
    )
    assert len(fast_e) == len(slow_e)
    np.testing.assert_allclose(np.asarray(fast_p), np.asarray(slow_p), rtol=1e-8, atol=1e-10)


def test_spectral_train_pls_converges():
    """End-to-end: the default (auto->spectral) train_pls converges to the
    same posterior mean as the analytic solution."""
    basis, cost = _setup("onb")
    pls = PLS(basis=basis, cost=cost)
    sigma2 = 0.1
    p = np.asarray(basis.train_projection)
    a = p.T @ p / sigma2 + np.diag(1.0 / np.asarray(basis.eigenvalues))
    b = p.T @ np.asarray(cost.y_train) / sigma2
    eta = 0.5 / np.linalg.eigvalsh(a).max()
    steps = int(np.ceil(12.0 / (eta * np.linalg.eigvalsh(a).min())))
    particles = pls.initialise_particles(2000, key=0)
    trained, energies = train_pls(pls, particles, steps, eta, key=1)
    assert energies[-1] < energies[0]
    mean_exact = np.linalg.solve(a, b)
    np.testing.assert_allclose(
        np.asarray(trained).mean(axis=1), mean_exact,
        atol=0.1 * np.abs(mean_exact).max() + 0.05,
    )


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_spectral_system_host_matches_jit(which):
    """The host-fp64 factorisation (hoisted out of jit to dodge the TPU's
    reduced-precision device eigh) must reproduce the in-jit factorisation:
    same eigenvalues, same reconstructed drift A == q_out diag(sigma) q_in^T,
    same bias b == q_out b_rot."""
    from projected_langevin_sampling_tpu.training import (
        _quadratic_system,
        spectral_system_host,
    )

    basis, cost = _setup(which)
    sys_j = jax.jit(lambda b, c: _spectral_system(b, c))(basis, cost)
    sys_h = spectral_system_host(basis, cost)
    np.testing.assert_allclose(
        np.asarray(sys_h.sigma), np.asarray(sys_j.sigma), rtol=1e-8
    )
    # eigenvectors are sign/rotation ambiguous; compare the reconstruction
    a_true = np.asarray(_quadratic_system(basis, cost)[0], dtype=np.float64)
    for sys in (sys_j, sys_h):
        a_rec = (
            np.asarray(sys.q_out, dtype=np.float64)
            @ np.diag(np.asarray(sys.sigma, dtype=np.float64))
            @ np.asarray(sys.q_in, dtype=np.float64).T
        )
        np.testing.assert_allclose(a_rec, a_true, rtol=1e-7, atol=1e-9)
    # b must be preserved: q_out @ b_rot == b
    b_true = np.asarray(_quadratic_system(basis, cost)[1], dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(sys_h.q_out, dtype=np.float64) @ np.asarray(sys_h.b_rot, np.float64),
        b_true,
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(float(sys_h.e_const), float(sys_j.e_const), rtol=1e-12)


def test_train_pls_spectral_uses_host_system_and_matches_law():
    """train_pls (which now precomputes the spectral system on host) must
    produce the same stationary moments as the quadratic tier."""
    basis, cost = _setup("onb")
    pls = PLS(basis=basis, cost=cost)
    particles = basis.initialise_particles(512, key=0)
    p_spec, _ = train_pls(pls, particles, 3000, 5e-3, key=7, fast_path="spectral")
    p_quad, _ = train_pls(pls, particles, 3000, 5e-3, key=7, fast_path="quadratic")
    np.testing.assert_allclose(
        np.asarray(p_spec.mean(axis=1)), np.asarray(p_quad.mean(axis=1)), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(p_spec.std(axis=1)), np.asarray(p_quad.std(axis=1)), rtol=0.25, atol=0.05
    )


def test_resolve_tier_strictness_and_validation():
    """resolve_tier: unknown discretisation raises everywhere; an
    incompatible (fast_path, discretisation) pair raises when strict and
    downgrades to the general tier when not (the jitted throughput path)."""
    from projected_langevin_sampling_tpu.training import resolve_tier

    basis, cost = _setup("onb")
    with pytest.raises(ValueError, match="discretisation"):
        resolve_tier(basis, cost, "auto", "exponentail", particles_bytes=0)
    with pytest.raises(ValueError, match="does not implement"):
        resolve_tier(basis, cost, "quadratic", "preconditioned", particles_bytes=0)
    assert (
        resolve_tier(
            basis, cost, "quadratic", "preconditioned", particles_bytes=0,
            strict=False,
        )
        == "off"
    )
    # the compatible pairs resolve the same under both modes
    for strict in (True, False):
        assert (
            resolve_tier(
                basis, cost, "auto", "preconditioned", particles_bytes=0,
                strict=strict,
            )
            == "spectral"
        )


def test_langevin_steps_downgrades_incompatible_tier():
    """quadratic + preconditioned has no tier: the throughput path must
    downgrade to the general branch and still run (train_pls raises)."""
    basis, cost = _setup("onb")
    u0 = basis.initialise_particles(6, key=0)
    u = langevin_steps(
        basis, cost, u0, as_key(1), 1e-3, 5,
        fast_path="quadratic", discretisation="preconditioned",
    )
    assert u.shape == u0.shape and bool(jnp.isfinite(u).all())


def test_general_fused_spec_rejects_foreign_quadrature_rule():
    """A SmoothedBernoulliCost carrying any 16-point rule OTHER than the
    physicists' hermgauss(16) the kernel bakes in must not fuse (the fused
    and off tiers would silently train different costs)."""
    from projected_langevin_sampling_tpu.models.costs import (
        make_smoothed_bernoulli_cost,
    )
    from projected_langevin_sampling_tpu.training import general_fused_cost_spec

    basis, _ = _setup("onb")
    y = jnp.asarray(np.random.default_rng(0).integers(0, 2, 32).astype(np.float64))
    s = jnp.full(32, 0.3)
    good = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    spec = general_fused_cost_spec(basis, good)
    assert spec is not None and spec[0] == "bernoulli_sigmoid_smoothed"
    # probabilists'-convention nodes: same count, different rule
    foreign = good.replace(
        gh_nodes=good.gh_nodes * np.sqrt(2.0),
        gh_weights=good.gh_weights / np.sqrt(np.pi),
    )
    assert general_fused_cost_spec(basis, foreign) is None


def test_parallel_train_pls_rejects_unknown_discretisation():
    from jax.sharding import Mesh
    from projected_langevin_sampling_tpu.parallel.auto import parallel_train_pls

    basis, cost = _setup("ipb")
    u0 = basis.initialise_particles(8, key=0)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "particles"))
    with pytest.raises(ValueError, match="discretisation"):
        parallel_train_pls(
            mesh, basis, cost, u0, number_of_epochs=1, key=0,
            discretisation="exponentail",
        )


def test_general_fused_spec_under_jit_trusts_only_the_factory_tag():
    """Inside jit the quadrature arrays are tracers and cannot be inspected:
    a factory-built cost (static gh_rule tag) must still fuse, while an
    untagged direct construction must refuse (it could carry any rule)."""
    from projected_langevin_sampling_tpu.models.costs import (
        SmoothedBernoulliCost,
        make_smoothed_bernoulli_cost,
    )
    from projected_langevin_sampling_tpu.training import general_fused_cost_spec

    basis, _ = _setup("onb")
    y = jnp.asarray(np.random.default_rng(0).integers(0, 2, 32).astype(np.float64))
    s = jnp.full(32, 0.3)
    good = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    untagged = SmoothedBernoulliCost(
        y_train=good.y_train, smoothing_std=good.smoothing_std,
        gh_nodes=good.gh_nodes, gh_weights=good.gh_weights,
    )
    # concrete: both are numerically the hermgauss(16) rule, both fuse
    assert general_fused_cost_spec(basis, untagged) is not None

    results = {}

    def probe_into(name):
        @jax.jit
        def probe(cost):
            results[name] = general_fused_cost_spec(basis, cost)
            return cost.y_train

        return probe

    probe_into("tagged")(good)
    probe_into("untagged")(untagged)
    assert results["tagged"] is not None and results["tagged"][0] == (
        "bernoulli_sigmoid_smoothed"
    )
    assert results["untagged"] is None


def test_auto_with_explicit_key_warns_once_about_law_only_tier():
    """PARITY.md deviation 3 ergonomics: fast_path="auto" resolving to the
    law-equivalent spectral tier must warn a caller who passed an explicit
    key/seed; explicit tiers and keyless auto runs stay silent."""
    import warnings as _warnings

    basis, cost = _setup("onb")
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(8, key=0)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        train_pls(pls, particles, 5, 1e-3, key=3, fast_path="auto")
    assert any("spectral tier" in str(w.message) for w in caught)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        train_pls(pls, particles, 5, 1e-3, key=3, fast_path="spectral")
        train_pls(pls, particles, 5, 1e-3, key=3, fast_path="quadratic")
        train_pls(pls, particles, 5, 1e-3, fast_path="auto")
    assert not [w for w in caught if "spectral tier" in str(w.message)]
