"""Poisson (count regression) cost. Reference ``costs/poisson.py:10-104``."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import Poisson
from projected_langevin_sampling_tpu.models.link_functions import (
    PLSLinkFunction,
    SquareLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class PoissonCost(PLSCostMixin):
    y_train: Array  # (N,) counts
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=SquareLinkFunction()
    )
    observation_noise: None = flax.struct.field(pytree_node=False, default=None)

    def predict(self, prediction_samples: Array) -> Poisson:
        return Poisson(rate=jnp.mean(prediction_samples, axis=1))

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        """sum_n (-2 y log|f| + link(f)) per particle (``poisson.py:47-66``)."""
        f = untransformed_train_prediction_samples
        rate = self.link_function(f)
        return jnp.sum(
            -2.0 * self.y_train[:, None] * jnp.log(jnp.abs(f)) + rate, axis=0
        )

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        """Closed form for the square link: -2y/f + 2f (``poisson.py:68-82``)."""
        if isinstance(self.link_function, SquareLinkFunction) and not force_autograd:
            f = untransformed_train_prediction_samples
            return -2.0 * self.y_train[:, None] / f + 2.0 * f
        return self._calculate_cost_derivative_autograd(
            untransformed_train_prediction_samples
        )
