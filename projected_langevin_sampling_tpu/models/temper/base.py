"""Variance tempering — reference ``src/temper/base.py:7-62``.

Closed-form calibration of the predictive variance on a held-out split:

    scale = (2/N) * sum_i (y_i - m(x_i))^2 / sigma_i^2

the NLL-minimising multiplicative factor; ``predict`` scales the predictive
variance by it. Regression only.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal

Array = jax.Array


class TemperBase(ABC):
    def __init__(self, x_calibration: Array, y_calibration: Array):
        self.scale = self._calculate_scale(
            x_calibration=x_calibration, y_calibration=y_calibration
        )

    def _calculate_scale(self, x_calibration: Array, y_calibration: Array) -> float:
        prediction = self._untempered_predict(x=x_calibration)
        return float(
            2.0
            * jnp.mean(
                jnp.square(y_calibration - prediction.mean) / prediction.variance
            )
        )

    @abstractmethod
    def _untempered_predict(self, x: Array) -> MultivariateNormal:
        raise NotImplementedError

    def predict(self, x: Array) -> MultivariateNormal:
        prediction = self._untempered_predict(x=x)
        return MultivariateNormal(
            mean=prediction.mean, variance=prediction.variance * self.scale
        )

    def __call__(self, x: Array) -> MultivariateNormal:
        return self.predict(x=x)
