"""Fused whole-run quadratic-tier Pallas trainer (interpret mode on CPU).

The quadratic tier is the only fused option for IPB+Gaussian (non-symmetric
drift, correlated noise — no spectral diagonalisation exists). Verified:
deterministic (zero-noise) trajectories and the pipelinable energy trace
match the XLA quadratic tier exactly for BOTH bases; early stopping
NaN-fills like the replayed reference stopper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.basis.orthonormal import OrthonormalBasis
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.ops.pallas.quadratic_train import (
    quadratic_train_fused,
)
from projected_langevin_sampling_tpu.training import (
    _quadratic_system,
    _train_pls_scan,
    resolve_fast_path,
)
from projected_langevin_sampling_tpu.utils.prng import as_key

N, M, J, STEPS, ETA = 48, 12, 16, 25, 1e-3


def _setup(which):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0), dtype=jnp.float32)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=N), dtype=jnp.float32
    )
    base = ARDKernel(
        lengthscales=jnp.asarray([0.4], jnp.float32),
        outputscale=jnp.asarray(1.0, jnp.float32),
    )
    kernel = PLSKernel(base_kernel=base, approximation_samples=x)
    z = jnp.asarray(np.linspace(-2, 2, M)[:, None], dtype=jnp.float32)
    if which == "onb":
        basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-3, verbose=False)
    else:
        basis = build_inducing_point_basis(
            kernel, z, jnp.asarray(np.sin(2 * np.linspace(-2, 2, M)), jnp.float32), x
        )
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, jnp.float32))
    return basis, cost


def _numpy_quadratic_flow(basis, cost, u0, steps, eta):
    a, b, e_mat, e_bias, e_const, shared = map(
        lambda v: v, _quadratic_system(basis, cost)
    )
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    e = np.asarray(e_mat, np.float64)
    eb = np.asarray(e_bias, np.float64)
    u = np.asarray(u0, np.float64)
    energies = []
    for _ in range(steps):
        u = u - eta * (a @ u - b[:, None])
        v = (a if shared else e) @ u
        energies.append(float(np.mean(0.5 * np.sum(u * v, 0) - eb @ u + float(e_const))))
    return u, np.asarray(energies)


@pytest.mark.parametrize("which", ["onb", "ipb"])
def test_deterministic_flow_matches_quadratic_system(which):
    basis, cost = _setup(which)
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    a, b, e_mat, e_bias, e_const, shared = _quadratic_system(basis, cost)
    noise_factor = None if isinstance(basis, OrthonormalBasis) else basis.noise_factor
    with pltpu.force_tpu_interpret_mode():
        u_fused, energies = quadratic_train_fused(
            a, b, e_mat, e_bias, noise_factor, u0,
            seed=0, eta=ETA, patience=jnp.inf, energy_const=e_const,
            num_steps=STEPS, shared=bool(shared), zero_noise=True,
        )
    u_np, e_np = _numpy_quadratic_flow(basis, cost, u0, STEPS, ETA)
    np.testing.assert_allclose(np.asarray(u_fused), u_np, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(energies), e_np, rtol=2e-4)


def test_tier_integration_and_early_stop():
    basis, cost = _setup("ipb")
    assert resolve_fast_path(basis, cost, "quadratic_fused") == "quadratic_fused"
    u0 = basis.initialise_particles(J, key=0).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        result = _train_pls_scan(
            basis, cost, u0, as_key(5), ETA, float("inf"), STEPS, "quadratic_fused"
        )
    assert result.particles.shape == u0.shape
    e = np.asarray(result.energies)
    assert np.isfinite(e).all() and e[-1] < e[0]
    assert int(result.steps_run) == STEPS

    # enormous step -> divergence -> NaN tail after the in-kernel stop
    with pltpu.force_tpu_interpret_mode():
        diverged = _train_pls_scan(
            basis, cost, u0, as_key(5), 1e4, float("inf"), STEPS, "quadratic_fused"
        )
    e = np.asarray(diverged.energies)
    assert np.isnan(e).any()
    first_nan = int(np.argmax(np.isnan(e)))
    assert not np.isnan(e[:first_nan]).any()
