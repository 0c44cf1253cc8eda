"""Deterministic fakes mirroring the reference's ``mockers/`` package
(``mockers/basis.py:6-97``, ``mockers/cost.py:7-52``, ``mockers/kernel.py:8-43``):
a constant-output basis, an identity-link cost, and inner-product kernels so
gram matrices are hand-computable in tests.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction

Array = jax.Array

MOCK_BASIS_DIM = 10


@flax.struct.dataclass
class MockBasis(PLSBasisMixin):
    """dim=10; train predictions are all-ones; update = +1 everywhere."""

    number_of_train_points: int = flax.struct.field(pytree_node=False, default=5)

    @property
    def approximation_dimension(self) -> int:
        return MOCK_BASIS_DIM

    @property
    def dtype(self):
        return jnp.float64

    def _initialise_particles(self, number_of_particles, noise_only=True, key=None):
        return jnp.ones((self.approximation_dimension, number_of_particles))

    def calculate_untransformed_train_prediction_samples(self, particles):
        return jnp.ones((self.number_of_train_points, particles.shape[1]))

    def calculate_energy_potential(self, particles, cost):
        return jnp.mean(cost)

    def sample_update_noise(self, number_of_particles, key):
        return jnp.zeros((self.approximation_dimension, number_of_particles))

    def _calculate_particle_update(self, particles, cost_derivative, step_size, noise):
        return jnp.ones_like(particles)

    def sample_predictive_noise(self, particles, x, key=None):
        return jnp.ones((self.approximation_dimension + x.shape[0], particles.shape[1]))

    def predict_untransformed_samples(self, particles, x, noise=None, key=None):
        return jnp.ones((x.shape[0], particles.shape[1]))


@flax.struct.dataclass
class MockCost(PLSCostMixin):
    """Identity link; cost = ones(J); derivative = ones(N, J)."""

    link_function: IdentityLinkFunction = flax.struct.field(
        pytree_node=False, default=IdentityLinkFunction()
    )
    observation_noise: None = flax.struct.field(pytree_node=False, default=None)

    @property
    def y_train(self):
        return jnp.zeros((1,))

    def predict(self, prediction_samples):
        return MultivariateNormal(
            mean=jnp.mean(prediction_samples, axis=1),
            variance=jnp.var(prediction_samples, axis=1, ddof=1),
        )

    def calculate_cost(self, untransformed_train_prediction_samples):
        return jnp.ones((untransformed_train_prediction_samples.shape[1],))

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples, force_autograd=False
    ):
        return jnp.ones_like(untransformed_train_prediction_samples)
