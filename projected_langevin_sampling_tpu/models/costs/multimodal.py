"""Bimodal Gaussian-mixture cost. Reference ``costs/multimodal.py:7-91``.

The two modes are the data likelihood shifted by ``shift`` with mixture
weights (bernoulli_noise, 1 - bernoulli_noise); the per-particle NLL is a
logsumexp over modes. The gradient is ALWAYS autograd, as in the reference
(``multimodal.py:79-91``) — one jax.grad, fused by XLA.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    PLSLinkFunction,
)

Array = jax.Array


@flax.struct.dataclass
class MultiModalCost(PLSCostMixin):
    y_train: Array  # (N,)
    observation_noise: Array  # scalar sigma (std, squared in the density)
    shift: float = flax.struct.field(pytree_node=False)
    bernoulli_noise: float = flax.struct.field(pytree_node=False)
    link_function: PLSLinkFunction = flax.struct.field(
        pytree_node=False, default=IdentityLinkFunction()
    )

    def predict(self, prediction_samples: Array) -> None:
        """The reference deliberately leaves this unimplemented
        (``multimodal.py:31-35``): mixture experiments consume raw samples."""
        return None

    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        pred = self.link_function(untransformed_train_prediction_samples)
        y = self.y_train[:, None]
        sigma2 = jnp.square(self.observation_noise)
        log_norm = 0.5 * jnp.log(2.0 * jnp.pi * sigma2)

        errors_mode_1 = y - pred + self.shift
        errors_mode_2 = y - pred
        log_lik_1 = -0.5 * jnp.square(errors_mode_1) / sigma2 - log_norm
        log_lik_2 = -0.5 * jnp.square(errors_mode_2) / sigma2 - log_norm

        stacked = jnp.stack(
            [
                jnp.log(self.bernoulli_noise) + log_lik_1,
                jnp.log(1.0 - self.bernoulli_noise) + log_lik_2,
            ]
        )  # (2, N, J)
        return -jnp.sum(jax.scipy.special.logsumexp(stacked, axis=0), axis=0)

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        return self._calculate_cost_derivative_autograd(
            untransformed_train_prediction_samples
        )
