"""Split conformal prediction — reference ``src/conformalise/base.py``
(method of arXiv 2107.07511, cited there at base.py:23).

Calibration scores are max(lower - y, y - upper) on the calibration split;
the coverage-level quantile (with the (n+1)/n finite-sample correction)
widens the raw bounds symmetrically; bounds never cross the median.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass
class ConformalPrediction:
    coverage: float
    mean: Array
    lower: Array
    upper: Array


class ConformaliseBase(ABC):
    def __init__(self, x_calibration: Array, y_calibration: Array):
        self.x_calibration = x_calibration
        self.y_calibration = y_calibration
        self.number_of_calibration_points = x_calibration.shape[0]

    @abstractmethod
    def _predict_uncalibrated_coverage(
        self, x: Array, coverage: float
    ) -> tuple[Array, Array]:
        """Raw (lower, upper) bounds at the given coverage level."""
        raise NotImplementedError

    @abstractmethod
    def predict_median(self, x: Array) -> Array:
        raise NotImplementedError

    def _calculate_calibration(self, coverage: float) -> float:
        """Conformal widening factor (reference ``base.py:58-90``)."""
        lower, upper = self._predict_uncalibrated_coverage(
            x=self.x_calibration, coverage=coverage
        )
        scores = jnp.maximum(lower - self.y_calibration, self.y_calibration - upper)
        n = self.number_of_calibration_points
        q = float(np.clip((n + 1) * coverage / n, 0.0, 1.0))
        return float(jnp.quantile(scores, q))

    def predict_coverage(self, x: Array, coverage: float) -> tuple[Array, Array]:
        """Calibrated (lower, upper) bounds; clamped so nothing crosses the
        median (reference ``base.py:92-114``)."""
        calibration = self._calculate_calibration(coverage)
        lower, upper = self._predict_uncalibrated_coverage(x=x, coverage=coverage)
        lower, upper = lower - calibration, upper + calibration
        median = self.predict_median(x)
        return jnp.minimum(lower, median), jnp.maximum(upper, median)

    def calculate_average_interval_width(self, x: Array, coverage: float) -> float:
        lower, upper = self.predict_coverage(x=x, coverage=coverage)
        return float(jnp.mean(upper - lower))

    def predict_variance(self, x: Array) -> Array:
        """Half the interval width at 2/3 coverage (reference ``base.py:130-141``)."""
        lower, upper = self.predict_coverage(x=x, coverage=2.0 / 3.0)
        return (upper - lower) / 2.0

    def predict(self, x: Array, coverage: float) -> ConformalPrediction:
        lower, upper = self.predict_coverage(x=x, coverage=coverage)
        return ConformalPrediction(
            coverage=coverage, mean=self.predict_median(x=x), lower=lower, upper=upper
        )

    def __call__(self, x: Array, coverage: float) -> ConformalPrediction:
        return self.predict(x=x, coverage=coverage)
