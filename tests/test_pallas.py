"""Pallas fused-update kernel vs the unfused XLA path (interpret mode on the
CPU backend; the compiled kernel runs on real TPU in bench/production)."""

import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    GaussianCost,
    PoissonCost,
    StudentTCost,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.ops.pallas import (
    dc_fn_for_cost,
    fused_langevin_update,
)

N, M, J = 70, 16, 24  # deliberately not multiples of the tile sizes
ETA = 1e-3


def _setup(which="onb"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (N, 1)), axis=0), dtype=jnp.float32)
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            jnp.asarray([0.4], dtype=jnp.float32), jnp.asarray(1.0, dtype=jnp.float32)
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, M)[:, None], dtype=jnp.float32)
    if which == "onb":
        basis = build_orthonormal_basis(
            kernel, z, x, eigenvalue_threshold=1e-4, verbose=False
        )
    else:
        y_ind = jnp.asarray(np.sin(np.linspace(-2, 2, M)), dtype=jnp.float32)
        basis = build_inducing_point_basis(kernel, z, y_ind, x)
    return basis, x


def _reference_update(basis, cost, u, noise, eta=ETA):
    pred = basis.calculate_untransformed_train_prediction_samples(u)
    dc = cost.calculate_cost_derivative(pred)
    return u + basis.calculate_particle_update(u, dc, eta, noise=noise)


def _fused(basis, cost, u, noise, which):
    dc_fn = dc_fn_for_cost(cost)
    assert dc_fn is not None
    if which == "onb":
        return fused_langevin_update(
            p=basis.train_projection,
            d=basis.train_projection,
            y=cost.y_train.astype(jnp.float32),
            u=u,
            prior=1.0 / basis.eigenvalues,
            noise=noise,
            dc_fn=dc_fn,
            eta=ETA,
            prior_is_diag=True,
            n_tile=32,
            j_tile=16,
            interpret=True,
        )
    m = basis.approximation_dimension
    return fused_langevin_update(
        p=basis.train_projection,
        d=basis.base_gram_induce_train.T,
        y=cost.y_train.astype(jnp.float32),
        u=u,
        prior=m * basis.inv_base_gram_induce,
        noise=noise,
        dc_fn=dc_fn,
        eta=ETA,
        prior_is_diag=False,
        n_tile=32,
        j_tile=16,
        interpret=True,
    )


def _costs(rng, dtype=jnp.float32):
    y = jnp.asarray(np.sin(2 * np.linspace(-2, 2, N)) + 0.1 * rng.normal(size=N), dtype=dtype)
    y_bin = jnp.asarray((rng.uniform(size=N) > 0.5).astype(np.float32))
    y_cnt = jnp.asarray(rng.poisson(3.0, N).astype(np.float32))
    return {
        "gaussian": GaussianCost(y_train=y, observation_noise=jnp.asarray(0.1, dtype=dtype)),
        "bernoulli": BernoulliCost(y_train=y_bin),
        "poisson": PoissonCost(y_train=y_cnt),
        "student_t": StudentTCost(y_train=y, degrees_of_freedom=4.0, scale=0.5),
    }


@pytest.mark.parametrize("which", ["onb", "ipb"])
@pytest.mark.parametrize("cost_name", ["gaussian", "bernoulli", "poisson", "student_t"])
def test_fused_update_matches_unfused(which, cost_name):
    rng = np.random.default_rng(1)
    basis, x = _setup(which)
    cost = _costs(rng)[cost_name]
    m = basis.approximation_dimension
    u = jnp.asarray(rng.normal(size=(m, J)), dtype=jnp.float32)
    if cost_name == "poisson":
        # keep f away from 0 (the derivative has a 1/f pole)
        u = u + 2.0
    noise = jnp.asarray(rng.normal(size=(m, J)), dtype=jnp.float32)
    expected = _reference_update(basis, cost, u, noise)
    fused = _fused(basis, cost, u, noise, which)
    # the Poisson derivative's 1/f pole amplifies f32 accumulation-order
    # differences between the fused and unfused matmuls
    rtol = 5e-3 if cost_name == "poisson" else 2e-4
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(expected), rtol=rtol, atol=2e-5
    )


def test_dc_fn_dispatch():
    rng = np.random.default_rng(2)
    costs = _costs(rng)
    for cost in costs.values():
        assert dc_fn_for_cost(cost) is not None
    from projected_langevin_sampling_tpu.models.costs import MultiModalCost

    mm = MultiModalCost(
        y_train=jnp.zeros(N), observation_noise=jnp.asarray(1.0),
        shift=1.0, bernoulli_noise=0.5,
    )
    assert dc_fn_for_cost(mm) is None  # autograd-only cost -> XLA path


def test_pallas_gram_matches_xla():
    from projected_langevin_sampling_tpu.ops.kernels import ard_gram
    from projected_langevin_sampling_tpu.ops.pallas import pallas_ard_gram

    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.normal(size=(100, 3)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(70, 3)), dtype=jnp.float32)
    kernel = ARDKernel(
        lengthscales=jnp.asarray([0.5, 1.0, 2.0], dtype=jnp.float32),
        outputscale=jnp.asarray(1.7, dtype=jnp.float32),
    )
    expected = ard_gram(kernel, x1, x2)
    got = pallas_ard_gram(
        x1 / kernel.lengthscales, x2 / kernel.lengthscales,
        outputscale=1.7, tile=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=1e-6)


def test_spectral_fused_deterministic_part_and_replay():
    """Interpret-mode PRNG yields zero noise, making the fused kernel
    deterministic: it must match the exact recurrence, and the early-stop
    replay must mark the right steps."""
    from jax.experimental.pallas import tpu as pltpu

    from projected_langevin_sampling_tpu.ops.pallas.spectral_train import (
        spectral_train_fused,
    )
    from projected_langevin_sampling_tpu.training import _replay_early_stopper

    m, j, t = 16, 32, 40
    rng = np.random.default_rng(0)
    w0 = np.asarray(rng.normal(size=(m, j)), dtype=np.float32)
    sigma = np.asarray(rng.uniform(1, 5, m), dtype=np.float32)
    b = np.asarray(rng.normal(size=m), dtype=np.float32)
    eta = 0.05
    decay, shift = 1 - eta * sigma, eta * b
    with pltpu.force_tpu_interpret_mode():
        w, en = spectral_train_fused(
            jnp.asarray(w0), jnp.asarray(decay), jnp.asarray(shift),
            jnp.asarray(sigma), jnp.asarray(b), seed=0, eta=eta,
            patience=np.inf, energy_const=1.0, num_steps=t,
        )
    w_exact = w0.copy()
    ens = []
    for _ in range(t):
        w_exact = decay[:, None] * w_exact + shift[:, None]
        e = 0.5 * (sigma[:, None] * w_exact**2).sum(0) - b @ w_exact
        ens.append(e.mean() + 1.0)
    np.testing.assert_allclose(np.asarray(w), w_exact, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(en), ens, rtol=1e-4, atol=1e-5)

    # replay: noiseless energies decrease monotonically -> nothing recorded as
    # stopped with infinite patience
    recorded, steps = _replay_early_stopper(jnp.asarray(en), eta, float("inf"))
    assert bool(recorded.all()) and int(steps) == t
    # tiny patience on a flat tail triggers a stop
    flat = jnp.asarray([3.0, 2.0, 2.0, 2.0, 2.0, 2.0], dtype=jnp.float32)
    recorded2, steps2 = _replay_early_stopper(flat, 1.0, 2.0)
    assert int(steps2) < 6
