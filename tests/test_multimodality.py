"""The paper's headline qualitative claim (reference README.md:10-12): the
particle cloud can represent NON-GAUSSIAN, MULTIMODAL posteriors that SVGP
cannot. Two constructions:

1. Poisson cost with the square link: the rate f^2 is sign-blind, so +f and
   -f explain the data equally — the posterior over f is symmetric-bimodal
   and randomly-initialised particles must split into both signs.
2. The bimodal mixture cost: particles initialised across the shift range
   must settle into both mixture modes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import MultiModalCost, PoissonCost
from projected_langevin_sampling_tpu.models.link_functions import SquareLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import train_pls


def test_poisson_square_link_posterior_is_bimodal():
    rng = np.random.default_rng(0)
    n, m, j = 60, 10, 200
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    f_true = 1.5 + 0.5 * np.sin(2 * np.asarray(x)[:, 0])
    y = jnp.asarray(rng.poisson(f_true**2).astype(float))

    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.6]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = PoissonCost(y_train=y, link_function=SquareLinkFunction())
    pls = PLS(basis=basis, cost=cost)

    particles = pls.initialise_particles(j, key=0)
    trained, energies = train_pls(
        pls, particles, number_of_epochs=4000, step_size=2e-4, key=1
    )
    assert energies[-1] < energies[0]

    # per-particle mean sign of the latent function over the train inputs
    f_particles = np.asarray(
        basis.calculate_untransformed_train_prediction_samples(trained)
    )  # (N, J)
    mean_sign = np.sign(f_particles.mean(axis=0))
    frac_positive = float(np.mean(mean_sign > 0))
    # both modes populated — neither sign owns more than ~85% of particles
    assert 0.15 < frac_positive < 0.85, frac_positive
    # and each particle is INTERNALLY coherent (one sign across inputs):
    # the rate it implies matches the data either way
    rates = f_particles**2
    rel_err = np.abs(rates.mean(axis=1) - f_true**2) / (f_true**2)
    assert float(np.median(rel_err)) < 0.5


def test_mixture_cost_particles_settle_into_both_modes():
    rng = np.random.default_rng(1)
    n, m, j = 80, 8, 100
    shift, weight, sigma = 6.0, 0.5, 0.5
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, (n, 1)), axis=0))
    f_true = np.sin(np.asarray(x)[:, 0])
    # data from mode 2 (no shift): y = f + noise
    y = jnp.asarray(f_true + sigma * rng.normal(size=n))

    kernel = PLSKernel(
        base_kernel=ARDKernel(jnp.asarray([0.8]), jnp.asarray(1.0)),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2, 2, m)[:, None])
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-2, verbose=False)
    cost = MultiModalCost(
        y_train=y,
        observation_noise=jnp.asarray(sigma),
        shift=shift,
        bernoulli_noise=weight,
    )
    pls = PLS(basis=basis, cost=cost)

    # bimodal init spanning the two candidate explanations: f ~ y (mode 2)
    # and f ~ y + shift (mode 1), mirroring the mixture experiment's
    # generate_init_particles
    m_k = basis.approximation_dimension
    base_noise = 0.01 * jax.random.normal(jax.random.key(0), (m_k, j))
    offsets = jnp.linspace(0.0, shift, j)[None, :]
    init_w = base_noise + jnp.sqrt(m_k * basis.eigenvalues)[:, None] * 0.0
    # push constant offsets into eigencoordinates: f = k(X,Z) Vt U, and a
    # roughly constant f(x) = c corresponds to U along the top eigenvector
    particles = basis.eigenvectors.T @ (
        jnp.ones((m, 1)) * offsets / jnp.sqrt(m_k * basis.eigenvalues)[:1, None]
    ) + base_noise

    trained, energies = train_pls(
        pls, particles, number_of_epochs=3000, step_size=5e-4, key=2
    )
    f_particles = np.asarray(
        basis.calculate_untransformed_train_prediction_samples(trained)
    )
    # per-particle mean offset from the mode-2 truth
    offsets_learned = (f_particles - f_true[:, None]).mean(axis=0)
    in_mode_2 = np.abs(offsets_learned) < shift / 3
    in_mode_1 = np.abs(offsets_learned - shift) < shift / 3
    assert in_mode_1.sum() > 5, f"mode 1 empty: {offsets_learned}"
    assert in_mode_2.sum() > 5, f"mode 2 empty: {offsets_learned}"
    # nothing stranded between modes
    assert (in_mode_1 | in_mode_2).mean() > 0.7
