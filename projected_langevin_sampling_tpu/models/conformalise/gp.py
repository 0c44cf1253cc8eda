"""Conformalised GP — reference ``src/conformalise/gp.py:12-64``:
uncalibrated bounds from Gaussian predictive intervals."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import scipy.stats

from projected_langevin_sampling_tpu.models.conformalise.base import ConformaliseBase
from projected_langevin_sampling_tpu.models.distributions import (
    MultivariateNormal,
    StudentTMarginals,
)

Array = jax.Array


class ConformaliseGP(ConformaliseBase):
    def __init__(self, gp, x_calibration: Array, y_calibration: Array):
        self.gp = gp
        super().__init__(x_calibration=x_calibration, y_calibration=y_calibration)

    @property
    def likelihood(self):
        return getattr(self.gp, "likelihood", None)

    def _predict_uncalibrated_coverage(
        self, x: Array, coverage: float
    ) -> tuple[Array, Array]:
        prediction = self.gp.predict_y(x)
        z = scipy.stats.norm.interval(coverage)[1]
        if isinstance(prediction, MultivariateNormal):
            std = jnp.sqrt(prediction.variance)
            loc = prediction.mean
        elif isinstance(prediction, StudentTMarginals):
            # Gaussian interval on the Student-T marginal moments — the
            # reference averages gpytorch's sampled Student-T marginals
            # (conformalise/gp.py:50-53); same first two moments.
            df = prediction.df
            var = jnp.square(prediction.scale) * (df / (df - 2.0)) if df > 2 else jnp.square(prediction.scale)
            std = jnp.sqrt(var)
            loc = prediction.loc
        else:
            raise ValueError(f"Unknown predictive type: {type(prediction)=}")
        return loc - z * std, loc + z * std

    def predict_median(self, x: Array) -> Array:
        latent = self.gp(x)
        return latent.mean
