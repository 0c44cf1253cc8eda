"""Multi-device tests on the 8-way virtual CPU mesh: the sharded Langevin
step must compute IDENTICAL math to the single-device path (the correctness
contract of SURVEY.md §5.8), and the stochastic path must converge to the
same stationary law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.parallel import (
    make_mesh,
    parallel_langevin_steps,
    parallel_langevin_steps_with_noise,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel

SIGMA2 = 0.1


def _setup(n=32, m=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    base = ARDKernel(lengthscales=jnp.asarray([0.4]), outputscale=jnp.asarray(1.0))
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y_induce = jnp.asarray(np.sin(2 * np.linspace(-2, 2, m)))
    return x, y, z, y_induce, kernel


def _manual_single_device(basis, cost, u, noise_seq, eta):
    """Reference single-device loop with injected noise."""
    u = np.asarray(u)
    for t in range(noise_seq.shape[0]):
        update = basis.calculate_particle_update(
            jnp.asarray(u), cost.calculate_cost_derivative(
                basis.calculate_untransformed_train_prediction_samples(jnp.asarray(u))
            ), eta, noise=jnp.asarray(noise_seq[t]),
        )
        u = u + np.asarray(update)
    return u


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("which", ["onb", "ipb"])
@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_matches_single_device_with_injected_noise(which, mesh_shape):
    x, y, z, y_induce, kernel = _setup()
    if which == "onb":
        basis = build_orthonormal_basis(
            kernel, z, x, eigenvalue_threshold=1e-2, verbose=False
        )
    else:
        basis = build_inducing_point_basis(kernel, z, y_induce, x)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    m_dim = basis.approximation_dimension
    j = 16
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.normal(size=(m_dim, j)))
    noise_seq = rng.normal(size=(5, m_dim, j))
    eta = 1e-3

    mesh = make_mesh(*mesh_shape)
    sharded = parallel_langevin_steps_with_noise(
        mesh, basis, cost, u0, jnp.asarray(noise_seq), eta
    )
    single = _manual_single_device(basis, cost, u0, noise_seq, eta)
    np.testing.assert_allclose(np.asarray(sharded), single, rtol=1e-9, atol=1e-11)


def test_sharded_bernoulli_cost_matches():
    """Non-Gaussian cost derivative is elementwise, so sharding over data must
    still be exact."""
    x, y, z, y_induce, kernel = _setup()
    y_bin = jnp.asarray((np.asarray(y) > 0).astype(float))
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = BernoulliCost(y_train=y_bin)
    m_dim = basis.approximation_dimension
    rng = np.random.default_rng(2)
    u0 = jnp.asarray(rng.normal(size=(m_dim, 8)))
    noise_seq = rng.normal(size=(3, m_dim, 8))
    mesh = make_mesh(2, 4)
    sharded = parallel_langevin_steps_with_noise(
        mesh, basis, cost, u0, jnp.asarray(noise_seq), 1e-3
    )
    single = _manual_single_device(basis, cost, u0, noise_seq, 1e-3)
    np.testing.assert_allclose(np.asarray(sharded), single, rtol=1e-9, atol=1e-11)


def test_stochastic_sharded_run_stationary_mean():
    """The in-shard PRNG path: converges to the same OU stationary mean as the
    analytic solution (distributional correctness)."""
    x, y, z, y_induce, kernel = _setup()
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    p = np.asarray(basis.train_projection)
    a = p.T @ p / SIGMA2 + np.diag(1.0 / np.asarray(basis.eigenvalues))
    b = p.T @ np.asarray(y) / SIGMA2
    mean_exact = np.linalg.solve(a, b)
    eta = 0.5 / np.linalg.eigvalsh(a).max()
    steps = int(np.ceil(10.0 / (eta * np.linalg.eigvalsh(a).min())))

    mesh = make_mesh(2, 4)
    j = 2048
    u0 = jnp.asarray(np.random.default_rng(3).normal(size=(basis.approximation_dimension, j)))
    final, energies = parallel_langevin_steps(
        mesh, basis, cost, u0, jax.random.key(0), eta, steps, with_energy=True
    )
    emp_mean = np.asarray(final).mean(axis=1)
    np.testing.assert_allclose(emp_mean, mean_exact, atol=0.1 * np.abs(mean_exact).max() + 0.05)
    assert energies.shape == (steps,)
    assert np.all(np.isfinite(np.asarray(energies)))
    assert float(energies[-1]) < float(energies[0])


def test_energy_matches_single_device_definition():
    """psum'd sharded energy == facade energy on the same particles."""
    from projected_langevin_sampling_tpu.models.pls import PLS

    x, y, z, y_induce, kernel = _setup()
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    mesh = make_mesh(2, 4)
    u0 = jnp.asarray(np.random.default_rng(4).normal(size=(basis.approximation_dimension, 16)))
    final, energies = parallel_langevin_steps(
        mesh, basis, cost, u0, jax.random.key(0), 1e-3, 1, with_energy=True
    )
    pls = PLS(basis=basis, cost=cost)
    expected = float(pls.calculate_energy_potential(jnp.asarray(np.asarray(final))))
    assert float(energies[0]) == pytest.approx(expected, rel=1e-9)


def test_auto_sharded_train_matches_single_device():
    """GSPMD path: jit-partitioned _train_pls_scan with particle-sharded
    inputs must match the unsharded program (threefry draws are position-
    deterministic, so same key -> same chain up to reduction order)."""
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.parallel import parallel_train_pls
    from projected_langevin_sampling_tpu.training import _train_pls_scan
    from projected_langevin_sampling_tpu.utils.prng import as_key

    x, y, z, y_induce, kernel = _setup()
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(32, key=0)
    mesh = make_mesh(1, 8)
    for fast_path in ["off", "quadratic", "spectral"]:
        sharded = parallel_train_pls(
            mesh, pls, particles=particles, number_of_epochs=20,
            step_size=1e-3, key=as_key(3), fast_path=fast_path,
        )
        single = _train_pls_scan(
            basis, cost, particles, as_key(3), 1e-3, float("inf"), 20, fast_path
        )
        np.testing.assert_allclose(
            np.asarray(sharded.particles), np.asarray(single.particles),
            rtol=1e-8, atol=1e-10, err_msg=fast_path,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.energies), np.asarray(single.energies),
            rtol=1e-8, atol=1e-10, err_msg=fast_path,
        )


def test_energy_matches_single_device_definition_ipb():
    """psum'd sharded energy for the IPB basis (dense prior-energy operator)."""
    from projected_langevin_sampling_tpu.models.pls import PLS

    x, y, z, y_induce, kernel = _setup()
    basis = build_inducing_point_basis(kernel, z, y_induce, x)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    mesh = make_mesh(2, 4)
    u0 = jnp.asarray(np.random.default_rng(5).normal(size=(basis.approximation_dimension, 16)))
    final, energies = parallel_langevin_steps(
        mesh, basis, cost, u0, jax.random.key(0), 1e-3, 1, with_energy=True
    )
    pls = PLS(basis=basis, cost=cost)
    expected = float(pls.calculate_energy_potential(jnp.asarray(np.asarray(final))))
    assert float(energies[0]) == pytest.approx(expected, rel=1e-8)


def test_harness_parallel_config_routes_through_mesh():
    """The experiment harness's ``pls.parallel`` config key (VERDICT r2 #5):
    ``experiments.trainers.train_pls(parallel={...})`` must produce the SAME
    particles and recorded energies as the single-device path for every
    discretisation (GSPMD runs the identical program, so this is exact up to
    reduction order)."""
    from experiments.trainers import train_pls as harness_train_pls
    from projected_langevin_sampling_tpu.models.pls import PLS

    x, y, z, y_induce, kernel = _setup()
    basis = build_orthonormal_basis(
        kernel, z, x, eigenvalue_threshold=1e-2, verbose=False
    )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(32, key=0)
    for discretisation in ["euler", "preconditioned"]:
        sharded_u, sharded_e = harness_train_pls(
            pls, particles, number_of_epochs=20, step_size=1e-3,
            early_stopper_patience=float("inf"), seed=3,
            discretisation=discretisation,
            parallel={"data": 2, "particles": 4},
        )
        single_u, single_e = harness_train_pls(
            pls, particles, number_of_epochs=20, step_size=1e-3,
            early_stopper_patience=float("inf"), seed=3,
            discretisation=discretisation,
        )
        np.testing.assert_allclose(
            np.asarray(sharded_u), np.asarray(single_u),
            rtol=1e-8, atol=1e-10, err_msg=discretisation,
        )
        np.testing.assert_allclose(sharded_e, single_e, rtol=1e-8, atol=1e-10)


def test_parallel_ipb_general_fused_matches_single_device():
    """IPB + ``fast_path="general_fused"`` (euler): parallel_train_pls must
    apply the same W-space rerouting train_pls does, so the two paths resolve
    to the same tier and produce the same chain (code-review r3 finding)."""
    from projected_langevin_sampling_tpu.parallel import parallel_train_pls
    from projected_langevin_sampling_tpu.models.pls import PLS
    from projected_langevin_sampling_tpu.utils.prng import as_key

    x, y, z, y_induce, kernel = _setup()
    y_cls = jnp.asarray((np.asarray(y) > 0).astype(np.float64))
    basis = build_inducing_point_basis(kernel, z, y_induce, x)
    from projected_langevin_sampling_tpu.models.link_functions import (
        SigmoidLinkFunction,
    )

    cost = BernoulliCost(y_train=y_cls, link_function=SigmoidLinkFunction())
    pls = PLS(basis=basis, cost=cost)
    particles = pls.initialise_particles(16, key=0)
    mesh = make_mesh(1, 8)
    sharded = parallel_train_pls(
        mesh, pls, particles=particles, number_of_epochs=10,
        step_size=1e-3, key=as_key(7), fast_path="general_fused",
    )
    # GSPMD cannot partition the opaque fused Pallas custom call, so the
    # parallel path clamps general_fused -> off on the SAME rerouted W-space
    # view train_pls would use; the single-device contract is therefore the
    # W-space off-tier chain mapped back through S.
    from projected_langevin_sampling_tpu.training import (
        _train_pls_scan,
        ipb_w_space_view,
    )

    view, s_mat, s_inv = ipb_w_space_view(basis)
    single = _train_pls_scan(
        view, cost, s_inv @ particles, as_key(7), 1e-3, float("inf"), 10, "off"
    )
    np.testing.assert_allclose(
        np.asarray(sharded.particles), np.asarray(s_mat @ single.particles),
        rtol=1e-8, atol=1e-10,
    )
