"""Torch-reference vs JAX trajectory parity with injected noise.

The reference supports noise injection (its update hooks at
``src/projected_langevin_sampling/projected_langevin_sampling.py:140-163``),
which SURVEY.md §7 identifies as the parity mechanism: PRNGs differ between
frameworks, so "bitwise-seeded parity" (BASELINE.json) is realised by driving
BOTH implementations with the SAME externally generated noise sequence and
asserting the trajectories coincide to fp64 tolerance.

The torch side below re-creates the reference's exact per-step op sequence
(``experiments/trainers.py:149-161`` + ``basis/orthonormal.py:98-158`` +
``costs/{gaussian,bernoulli}.py`` closed forms) — it is the same faithful
re-implementation used for BENCH_BASELINE.json (see bench_reference.py),
not imported or copied reference code. The JAX side runs the PRODUCTION
``_train_pls_scan`` (fast_path="off"), with the noise sequence pre-drawn
from the very keys the scan will use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import BernoulliCost, GaussianCost
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import _train_pls_scan
from projected_langevin_sampling_tpu.utils.prng import as_key

N, M, J, STEPS, STEP_SIZE = 64, 16, 8, 50, 1e-3


def _setup(problem):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0))
    f_true = np.sin(2 * np.asarray(x)[:, 0])
    kernel = PLSKernel(
        base_kernel=ARDKernel(lengthscales=jnp.asarray([0.4]), outputscale=jnp.asarray(1.0)),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, M)[:, None])
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-3, verbose=False)
    if problem == "gaussian":
        y = jnp.asarray(f_true + 0.1 * rng.normal(size=N))
        cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1))
    else:
        y = jnp.asarray((f_true + 0.1 * rng.normal(size=N) > 0).astype(np.float64))
        cost = BernoulliCost(y_train=y)
    return basis, cost


def _torch_reference_run(basis, cost, particles0, noise_seq, problem):
    """The reference op sequence in torch float64, noise injected per step."""
    dt = torch.float64
    k_zx = torch.as_tensor(np.array(basis.base_gram_induce_train), dtype=dt)
    scaled_v = torch.as_tensor(np.array(basis.scaled_eigenvectors), dtype=dt)
    lam = torch.as_tensor(np.array(basis.eigenvalues), dtype=dt)
    y = torch.as_tensor(np.array(cost.y_train), dtype=dt)[:, None]
    u = torch.as_tensor(np.array(particles0), dtype=dt)
    eta = STEP_SIZE
    root2eta = float(np.sqrt(2.0 * eta))
    jitter = 1e-10

    def cost_derivative(pred):
        if problem == "gaussian":
            return (pred - y) / 0.1
        p = torch.clip(torch.sigmoid(pred), jitter, 1.0 - jitter)
        return -y * (1.0 - p) + (1.0 - y) * p

    def cost_fn(pred):
        if problem == "gaussian":
            return (0.5 / 0.1) * torch.square(pred - y).sum(dim=0)
        p = torch.clip(torch.sigmoid(pred), jitter, 1.0 - jitter)
        return -(y * torch.log(p) + (1.0 - y) * torch.log(1.0 - p)).sum(dim=0)

    energies = []
    for t in range(STEPS):
        pred = k_zx.T @ scaled_v @ u  # recomputed per step, orthonormal.py:106-108
        dc = cost_derivative(pred)
        # the reference draws eps via eigh of the IDENTITY covariance
        # (samplers.py:27); with injected z the transform is exactly z
        eps = torch.as_tensor(noise_seq[t], dtype=dt)
        u = u + (
            -eta * scaled_v.T @ (k_zx @ dc)
            - eta * torch.diag(torch.reciprocal(lam)) @ u
            + root2eta * eps
        )
        pred2 = k_zx.T @ scaled_v @ u
        prior = 0.5 * (u * (torch.diag(torch.reciprocal(lam)) @ u)).sum(dim=0)
        energies.append(float((cost_fn(pred2) + prior).mean()))
    return np.asarray(u), np.asarray(energies)


@pytest.mark.parametrize("problem", ["gaussian", "bernoulli"])
def test_torch_reference_trajectory_parity(problem):
    basis, cost = _setup(problem)
    particles0 = basis.initialise_particles(J, key=0)
    m_k = basis.approximation_dimension

    # pre-draw the EXACT noise the production scan will use: the scan splits
    # the run key into per-step keys and calls basis.sample_update_noise
    key = as_key(123)
    step_keys = jax.random.split(key, STEPS)
    noise_seq = np.stack(
        [np.asarray(basis.sample_update_noise(J, k)) for k in step_keys]
    )
    assert noise_seq.shape == (STEPS, m_k, J)

    result = _train_pls_scan(
        basis, cost, particles0, key, STEP_SIZE, float("inf"), STEPS, "off"
    )
    u_torch, e_torch = _torch_reference_run(basis, cost, particles0, noise_seq, problem)

    np.testing.assert_allclose(
        np.asarray(result.particles), u_torch, rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(np.asarray(result.energies), e_torch, rtol=1e-9)


def test_torch_reference_parity_quadratic_tier():
    """The quadratic fast tier must ALSO track the torch reference trajectory
    (it is algebraically identical, only fp reassociation differs)."""
    basis, cost = _setup("gaussian")
    particles0 = basis.initialise_particles(J, key=0)
    key = as_key(123)
    step_keys = jax.random.split(key, STEPS)
    noise_seq = np.stack(
        [np.asarray(basis.sample_update_noise(J, k)) for k in step_keys]
    )
    result = _train_pls_scan(
        basis, cost, particles0, key, STEP_SIZE, float("inf"), STEPS, "quadratic"
    )
    u_torch, e_torch = _torch_reference_run(basis, cost, particles0, noise_seq, "gaussian")
    np.testing.assert_allclose(
        np.asarray(result.particles), u_torch, rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(result.energies), e_torch, rtol=1e-7)
