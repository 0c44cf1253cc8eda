"""Tempered PLS — reference ``src/temper/pls.py:9-52``."""

from __future__ import annotations

import jax

from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.temper.base import TemperBase
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class TemperPLS(TemperBase):
    """Temper a PLS model's predictive variance. Requires a Gaussian cost
    (regression) unless ``debug``."""

    def __init__(
        self,
        x_calibration: Array,
        y_calibration: Array,
        pls: PLS,
        particles: Array,
        debug: bool = False,
        key: KeyArray | int | None = None,
    ):
        self.debug = debug
        if not self.debug:
            assert isinstance(pls.cost, GaussianCost)
        self.pls = pls
        self.particles = particles
        self._key = as_key(key)
        self._calls = 0
        super().__init__(x_calibration=x_calibration, y_calibration=y_calibration)

    def _next_key(self):
        # fresh noise per predict call, like the reference's global torch PRNG,
        # but reproducible from the constructor key
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def _untempered_predict(self, x: Array) -> MultivariateNormal:
        prediction = self.pls(
            x=x,
            particles=self.particles,
            predictive_noise=None,
            observation_noise=None,
            key=self._next_key(),
        )
        if not self.debug:
            assert isinstance(prediction, MultivariateNormal)
        return prediction
