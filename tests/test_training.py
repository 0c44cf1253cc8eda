"""Training-loop tests: early-stop semantics match the reference
(``experiments/trainers.py:139-162`` + ``early_stopper.py:4-24``) and — the
core correctness property — the Langevin chain's stationary law matches the
EXACT discrete-time OU stationary distribution for the Gaussian cost (which
in the continuous limit is the analytic function-space posterior the paper
proves PLS recovers, reference README.md:10-12).

For the Gaussian cost + identity link the update is linear:
    U' = (I - eta A) U + eta b + sqrt(2 eta) S z,   S S^T = C
so the stationary mean is A^{-1} b exactly, and the stationary covariance
solves the discrete Lyapunov equation Sigma = (I-eta A) Sigma (I-eta A)^T + 2 eta C.
Step sizes are chosen from the spectral bound eta < 2 / lambda_max(A).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import langevin_steps, train_pls

SIGMA2 = 0.1
EIG_THRESHOLD = 1e-2


def _setup(n=24, m=8, seed=0, lengthscale=0.4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    base = ARDKernel(
        lengthscales=jnp.asarray([lengthscale]), outputscale=jnp.asarray(1.0)
    )
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    x_induce = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    y_induce = jnp.asarray(np.sin(2 * np.linspace(-2, 2, m)))
    return x, y, x_induce, y_induce, kernel


def _ou_system(basis, which, y):
    """Return (A, b, C): drift precision, offset, noise covariance."""
    p = np.asarray(basis.train_projection)
    if which == "onb":
        prior_prec = np.diag(1.0 / np.asarray(basis.eigenvalues))
        noise_cov = np.eye(basis.approximation_dimension)
    else:
        kinv = np.asarray(basis.inv_base_gram_induce)
        prior_prec = basis.approximation_dimension * (kinv @ kinv)
        noise_cov = np.asarray(basis.base_gram_induce)
    a = p.T @ p / SIGMA2 + prior_prec
    b = p.T @ np.asarray(y) / SIGMA2
    return a, b, noise_cov


def _build(which):
    x, y, x_induce, y_induce, kernel = _setup()
    if which == "onb":
        basis = build_orthonormal_basis(
            kernel, x_induce, x, eigenvalue_threshold=EIG_THRESHOLD, verbose=False
        )
    else:
        basis = build_inducing_point_basis(kernel, x_induce, y_induce, x)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(SIGMA2))
    return PLS(basis=basis, cost=cost), y


def _stable_step(pls, y, which, factor=0.5):
    a, _, _ = _ou_system(pls.basis, which, y)
    return factor / float(np.linalg.eigvalsh(a).max())


def test_train_pls_runs_and_reduces_energy():
    pls, y = _build("onb")
    step = _stable_step(pls, y, "onb")
    particles = pls.initialise_particles(50, key=0)
    trained, energies = train_pls(
        pls, particles, number_of_epochs=200, step_size=step, key=1
    )
    assert trained.shape == particles.shape
    assert len(energies) == 200
    assert energies[-1] < energies[0]
    assert np.all(np.isfinite(np.asarray(trained)))


def test_train_pls_stops_on_divergence():
    """Huge step size -> non-finite energy -> immediate stop (early_stopper.py:16-17)."""
    pls, y = _build("onb")
    particles = pls.initialise_particles(10, key=0)
    trained, energies = train_pls(
        pls, particles, number_of_epochs=500, step_size=1e6, key=1
    )
    assert len(energies) < 500


def test_train_pls_patience_in_simulation_time():
    """Patience accumulates step_size while the energy is non-improving and
    stops when it crosses the threshold (early_stopper.py:18-23)."""
    pls, y = _build("onb")
    step = _stable_step(pls, y, "onb")
    particles = pls.initialise_particles(20, key=0)
    trained, energies = train_pls(
        pls, particles, number_of_epochs=20_000, step_size=step,
        early_stopper_patience=20 * step, key=1,
    )
    assert len(energies) < 20_000


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_stationary_distribution_matches_discrete_ou(which):
    pls, y = _build(which)
    a, b, c = _ou_system(pls.basis, which, y)
    eta = 0.5 / np.linalg.eigvalsh(a).max()
    # mixing time of the slowest mode, with margin
    steps = int(np.ceil(12.0 / (eta * np.linalg.eigvalsh(a).min())))
    j = 4000

    particles = pls.initialise_particles(j, key=0)
    trained = np.asarray(
        langevin_steps(pls.basis, pls.cost, particles, jax.random.key(1), eta, steps)
    )
    assert np.all(np.isfinite(trained))

    mean_exact = np.linalg.solve(a, b)
    m_mat = np.eye(a.shape[0]) - eta * a
    cov_exact = scipy.linalg.solve_discrete_lyapunov(m_mat, 2 * eta * c)

    emp_mean = trained.mean(axis=1)
    # tolerance: a few standard errors of the particle mean
    se = np.sqrt(np.diag(cov_exact) / j)
    assert np.all(np.abs(emp_mean - mean_exact) < 6 * se + 0.02 * np.abs(mean_exact).max())

    emp_cov_diag = np.diag(np.cov(trained))
    np.testing.assert_allclose(
        emp_cov_diag, np.diag(cov_exact), rtol=0.25, atol=1e-6
    )


def test_langevin_steps_matches_train_pls_dynamics():
    """The throughput path and the energy-tracking path must apply the same
    update given the same keys (energy evaluation must not perturb the chain)."""
    pls, y = _build("onb")
    step = _stable_step(pls, y, "onb")
    particles = pls.initialise_particles(8, key=0)
    a = langevin_steps(pls.basis, pls.cost, particles, jax.random.key(5), step, 50)
    b, _ = train_pls(pls, particles, 50, step, key=jax.random.key(5))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


def test_replay_early_stopper_matches_sequential():
    """The vectorised replay must reproduce the sequential EarlyStopper on
    arbitrary traces (incl. non-finite tails and plateaus)."""
    from projected_langevin_sampling_tpu.training import _replay_early_stopper
    from projected_langevin_sampling_tpu.utils.early_stopper import EarlyStopper

    rng = np.random.default_rng(0)
    for trial in range(30):
        t = int(rng.integers(3, 40))
        trace = rng.normal(size=t).astype(np.float64)
        if trial % 3 == 0:  # plant a NaN tail like the fused kernel writes
            cut = int(rng.integers(1, t))
            trace[cut:] = np.nan
        if trial % 4 == 0:  # plateau to trigger patience
            trace[t // 2 :] = trace[t // 2]
        step = float(rng.uniform(0.01, 1.0))
        patience = float(rng.choice([np.inf, step * rng.integers(1, 6)]))

        stopper = EarlyStopper(patience=patience)
        recorded_seq, steps_seq, stopped = [], 0, False
        for e in trace:
            if stopped:
                recorded_seq.append(False)
                continue
            steps_seq += 1
            if stopper.should_stop(float(e), step):
                stopped = True
                recorded_seq.append(False)
            else:
                recorded_seq.append(True)

        recorded_vec, steps_vec = _replay_early_stopper(
            jnp.asarray(trace), step, patience
        )
        np.testing.assert_array_equal(
            np.asarray(recorded_vec), np.asarray(recorded_seq),
            err_msg=f"trial {trial}",
        )
        assert int(steps_vec) == steps_seq, f"trial {trial}"
