"""Student-T (heavy-tailed regression) cost. Reference ``costs/student_t.py:11-110``."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.distributions import StudentTMarginals
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    PLSLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class StudentTCost(PLSCostMixin):
    y_train: Array  # (N,)
    degrees_of_freedom: float = flax.struct.field(pytree_node=False)
    scale: float = flax.struct.field(pytree_node=False, default=1.0)
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=IdentityLinkFunction()
    )
    observation_noise: None = flax.struct.field(pytree_node=False, default=None)

    def predict(self, prediction_samples: Array) -> StudentTMarginals:
        """Reference ``student_t.py:40-53``: loc = mean of link(samples),
        shared fitted scale."""
        loc = jnp.mean(self.link_function(prediction_samples), axis=1)
        return StudentTMarginals(
            df=self.degrees_of_freedom,
            loc=loc,
            scale=self.scale * jnp.ones_like(loc),
        )

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        """0.5 (df+1) sum_n log(1 + e^2/(df scale^2)) per particle
        (``student_t.py:55-72``)."""
        pred = self.link_function(untransformed_train_prediction_samples)
        errors = pred - self.y_train[:, None]
        df, s2 = self.degrees_of_freedom, self.scale**2
        return 0.5 * (df + 1.0) * jnp.sum(
            jnp.log1p(jnp.square(errors) / (df * s2)), axis=0
        )

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        """Closed form for identity link: (df+1) e / (df scale^2 + e^2)
        (``student_t.py:74-88``)."""
        if isinstance(self.link_function, IdentityLinkFunction) and not force_autograd:
            pred = self.link_function(untransformed_train_prediction_samples)
            errors = pred - self.y_train[:, None]
            df, s2 = self.degrees_of_freedom, self.scale**2
            return (df + 1.0) * errors / (df * s2 + jnp.square(errors))
        return self._calculate_cost_derivative_autograd(
            untransformed_train_prediction_samples
        )
