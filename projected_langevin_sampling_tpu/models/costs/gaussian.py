"""Gaussian (regression) cost. Reference ``costs/gaussian.py:11-110``."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    PLSLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class GaussianCost(PLSCostMixin):
    y_train: Array  # (N,)
    observation_noise: Array  # scalar, treated as the noise *variance* in the NLL
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=IdentityLinkFunction()
    )

    def predict(self, prediction_samples: Array) -> MultivariateNormal:
        """Moment-match over particles (reference ``gaussian.py:40-52``).
        Variance uses the unbiased (ddof=1) estimator like ``torch.var``."""
        return MultivariateNormal(
            mean=jnp.mean(prediction_samples, axis=1),
            variance=jnp.var(prediction_samples, axis=1, ddof=1),
        )

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        """(1/(2 sigma^2)) ||link(F) - y||^2 per particle (``gaussian.py:54-73``)."""
        pred = self.link_function(untransformed_train_prediction_samples)
        errors = pred - self.y_train[:, None]  # (N, J)
        return (0.5 / self.observation_noise) * jnp.sum(jnp.square(errors), axis=0)

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        if isinstance(self.link_function, IdentityLinkFunction) and not force_autograd:
            pred = self.link_function(untransformed_train_prediction_samples)
            return (pred - self.y_train[:, None]) / self.observation_noise
        return self._calculate_cost_derivative_autograd(
            untransformed_train_prediction_samples
        )
