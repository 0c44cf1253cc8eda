"""PLS orchestrator tests with mock basis/cost — mirrors reference
``tests/test_pls.py:5-46`` (every facade method), plus observation-noise
proxy semantics."""

import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.models.pls import PLS
from tests.mockers import MockBasis, MockCost

J = 3
N_TRAIN = 5


def _pls():
    return PLS(basis=MockBasis(number_of_train_points=N_TRAIN), cost=MockCost())


def test_initialise_particles():
    pls = _pls()
    particles = pls.initialise_particles(J)
    np.testing.assert_array_equal(np.asarray(particles), np.ones((10, J)))


def test_calculate_cost():
    pls = _pls()
    particles = pls.initialise_particles(J)
    np.testing.assert_array_equal(np.asarray(pls.calculate_cost(particles)), np.ones(J))


def test_calculate_cost_derivative():
    pls = _pls()
    particles = pls.initialise_particles(J)
    np.testing.assert_array_equal(
        np.asarray(pls.calculate_cost_derivative(particles)), np.ones((N_TRAIN, J))
    )


def test_calculate_particle_update():
    pls = _pls()
    particles = pls.initialise_particles(J)
    update = pls.calculate_particle_update(particles, step_size=0.1, key=0)
    np.testing.assert_array_equal(np.asarray(update), np.ones((10, J)))


def test_calculate_energy_potential():
    pls = _pls()
    particles = pls.initialise_particles(J)
    assert float(pls.calculate_energy_potential(particles)) == 1.0


def test_predict_returns_distribution():
    pls = _pls()
    particles = pls.initialise_particles(J)
    x = jnp.zeros((4, 2))
    dist = pls(x=x, particles=particles, key=0)
    assert isinstance(dist, MultivariateNormal)
    np.testing.assert_array_equal(np.asarray(dist.mean), np.ones(4))


def test_predict_samples_with_injected_noise():
    pls = _pls()
    particles = pls.initialise_particles(J)
    x = jnp.zeros((4, 2))
    samples = pls.predict_samples(
        particles=particles,
        x=x,
        predictive_noise=jnp.ones((10 + 4, J)),
        observation_noise=jnp.zeros(J),
    )
    assert samples.shape == (4, J)


def test_sample_observation_noise_zero_for_none():
    pls = _pls()
    np.testing.assert_array_equal(
        np.asarray(pls.sample_observation_noise(J)), np.zeros(J)
    )


def test_observation_noise_proxy():
    cost = GaussianCost(y_train=jnp.zeros(3), observation_noise=jnp.asarray(1.0))
    pls = PLS(basis=MockBasis(), cost=cost)
    assert float(pls.observation_noise) == 1.0
    pls.observation_noise = 2.5
    assert float(pls.observation_noise) == 2.5
    assert float(pls.cost.observation_noise) == 2.5


def test_default_name():
    assert _pls().name == "pls"
    assert PLS(basis=MockBasis(), cost=MockCost(), name="custom").name == "custom"
