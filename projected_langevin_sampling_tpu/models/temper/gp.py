"""Tempered GP — reference ``src/temper/gp.py:11-40``."""

from __future__ import annotations

import jax

from projected_langevin_sampling_tpu.models.distributions import (
    MultivariateNormal,
    StudentTMarginals,
)
from projected_langevin_sampling_tpu.models.temper.base import TemperBase

Array = jax.Array


class TemperGP(TemperBase):
    """Temper the predictive variance of an ExactGP or SVGP (the reference's
    ``gp.likelihood(gp(x))`` is our ``gp.predict_y``). Student-T predictive
    marginals are moment-matched to a Gaussian, like the reference tempering a
    gpytorch StudentTLikelihood marginal through mean/covariance."""

    def __init__(self, gp, x_calibration: Array, y_calibration: Array):
        self.gp = gp
        super().__init__(x_calibration=x_calibration, y_calibration=y_calibration)

    def _untempered_predict(self, x: Array) -> MultivariateNormal:
        prediction = self.gp.predict_y(x)
        if isinstance(prediction, StudentTMarginals):
            return MultivariateNormal(
                mean=prediction.mean, variance=prediction.variance
            )
        assert isinstance(prediction, MultivariateNormal)
        return prediction
