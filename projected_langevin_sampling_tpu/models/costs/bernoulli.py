"""Bernoulli (binary classification) cost. Reference ``costs/bernoulli.py:10-99``."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import Bernoulli
from projected_langevin_sampling_tpu.models.link_functions import (
    PLSLinkFunction,
    SigmoidLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class BernoulliCost(PLSCostMixin):
    y_train: Array  # (N,) in {0, 1}
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=SigmoidLinkFunction()
    )
    observation_noise: None = flax.struct.field(pytree_node=False, default=None)

    def predict(self, prediction_samples: Array) -> Bernoulli:
        return Bernoulli(probs=jnp.mean(prediction_samples, axis=1))

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        """Cross-entropy per particle (``bernoulli.py:48-62``)."""
        p = self.link_function(untransformed_train_prediction_samples)  # (N, J)
        y = self.y_train[:, None]
        return -jnp.sum(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p), axis=0)

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        """Closed form for the sigmoid link: -y(1-p) + (1-y)p (``bernoulli.py:64-77``)."""
        if isinstance(self.link_function, SigmoidLinkFunction) and not force_autograd:
            p = self.link_function(untransformed_train_prediction_samples)
            y = self.y_train[:, None]
            return -y * (1.0 - p) + (1.0 - y) * p
        return self._calculate_cost_derivative_autograd(
            untransformed_train_prediction_samples
        )
