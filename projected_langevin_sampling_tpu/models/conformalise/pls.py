"""Conformalised PLS — reference ``src/conformalise/pls.py:9-62``:
uncalibrated bounds are particle-sample quantiles."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.conformalise.base import ConformaliseBase
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class ConformalisePLS(ConformaliseBase):
    def __init__(
        self,
        x_calibration: Array,
        y_calibration: Array,
        pls: PLS,
        particles: Array,
        key: KeyArray | int | None = None,
    ):
        self.pls = pls
        self.particles = particles
        self._key = as_key(key)
        self._calls = 0
        super().__init__(x_calibration=x_calibration, y_calibration=y_calibration)

    def _next_key(self):
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def _samples(self, x: Array) -> Array:
        return self.pls.predict_samples(
            x=x,
            particles=self.particles,
            predictive_noise=None,
            observation_noise=None,
            key=self._next_key(),
        )

    def _predict_uncalibrated_coverage(
        self, x: Array, coverage: float
    ) -> tuple[Array, Array]:
        samples = self._samples(x)
        lower_q = 0.5 - coverage / 2.0
        upper_q = 0.5 + coverage / 2.0
        return (
            jnp.quantile(samples, lower_q, axis=1),
            jnp.quantile(samples, upper_q, axis=1),
        )

    def predict_median(self, x: Array) -> Array:
        return jnp.quantile(self._samples(x), 0.5, axis=1)
