"""Spread-tempered PLS CLASSIFICATION predictive — new capability, no
reference counterpart (the reference's temper layer, ``src/temper/base.py``,
is regression-only: it scales a Gaussian predictive variance by a
closed-form factor).

Motivation (round-5 loss-attribution campaign, RESULTS.md "Mechanism"
sections): on the headline classification protocol the PLS particle cloud
reaches its stationary law with 2.5-4x SVGP's latent variance, and the two
residual significant NLL losses (breast_wdbc, wine_uci) are carried
entirely by that extra dispersion — fitting ONE contraction scalar per
model on validation flips both losses into PLS wins
(``results/gap_attribution_*.md``, spread-tempered deltas). This class
ships that transform as a model layer:

    f_j(x)  ->  f_bar(x) + s * (f_j(x) - f_bar(x)),        j = 1..J

with ``s`` chosen on a calibration split by grid search on the Bernoulli
NLL of the sample-averaged link probabilities (s = 1 is always in the
grid, so tempering never loses on the calibration split). The latent MEAN
field is untouched — only the cloud's spread around it is calibrated, the
exact analogue of what ``TemperBase`` does to a Gaussian variance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array

# 0.05x .. 3x contraction/expansion grid, with s=1 included exactly
DEFAULT_SCALE_GRID = tuple(
    float(s) for s in np.sort(np.append(np.geomspace(0.05, 3.0, 61), 1.0))
)


def _bernoulli_nll(probs: Array, y: Array) -> Array:
    # 1e-7 floor is representable in float32 on both sides (1 - 1e-7 != 1)
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))


class TemperPLSClassification:
    """Validation-calibrated latent-spread temper for a trained PLS
    classifier (any link with a ``transform`` into probabilities)."""

    def __init__(
        self,
        x_calibration: Array,
        y_calibration: Array,
        pls: PLS,
        particles: Array,
        key: KeyArray | int | None = None,
        scale_grid: tuple[float, ...] = DEFAULT_SCALE_GRID,
    ):
        self.pls = pls
        self.particles = particles
        self._key = as_key(key)
        self._calls = 0
        self.scale_grid = scale_grid
        f_cal = self._latent_samples(x_calibration)
        y_cal = jnp.asarray(y_calibration, dtype=f_cal.dtype)
        nlls = [
            float(_bernoulli_nll(self._tempered_probs(f_cal, s), y_cal))
            for s in scale_grid
        ]
        self.scale = float(scale_grid[int(np.argmin(nlls))])
        self.calibration_nll = float(min(nlls))

    def _next_key(self):
        # fresh predictive noise per call, reproducible from the constructor
        # key (same convention as TemperPLS)
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def _latent_samples(self, x: Array) -> Array:
        return self.pls.predict_untransformed_samples(
            particles=self.particles, x=x, key=self._next_key()
        )

    def _tempered_probs(self, f_samples: Array, s: float) -> Array:
        f_bar = jnp.mean(f_samples, axis=1, keepdims=True)
        f = f_bar + s * (f_samples - f_bar)
        return jnp.mean(self.pls.cost.link_function.transform(f), axis=1)

    def predict_probs(self, x: Array) -> Array:
        """Tempered class-1 probabilities, shape (N,)."""
        return self._tempered_probs(self._latent_samples(x), self.scale)

    def __call__(self, x: Array) -> Array:
        return self.predict_probs(x=x)
