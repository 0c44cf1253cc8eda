"""Additional predictive-noise distributions for heavy-tailed bases.

The reference passes a ``torch.distributions.Distribution`` (a StudentT in
the UCI Student-T experiments) into the basis as
``additional_predictive_noise_distribution`` and samples it on top of the
Gaussian predictive noise (``basis/orthonormal.py:210-213``,
``basis/inducing_point.py:197-201``). Here the equivalent is a small frozen
dataclass with a pure ``sample(key, shape)`` — static (hashable) so it can
be a non-pytree field of the basis structs.
"""

from __future__ import annotations

import dataclasses

import jax

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class StudentTPredictiveNoise:
    df: float
    loc: float = 0.0
    scale: float = 1.0

    def sample(self, key: jax.Array, shape: tuple[int, ...], dtype=None) -> Array:
        draws = jax.random.t(key, self.df, shape, dtype=dtype)
        return self.loc + self.scale * draws


@dataclasses.dataclass(frozen=True)
class NormalPredictiveNoise:
    loc: float = 0.0
    scale: float = 1.0

    def sample(self, key: jax.Array, shape: tuple[int, ...], dtype=None) -> Array:
        return self.loc + self.scale * jax.random.normal(key, shape, dtype=dtype)
