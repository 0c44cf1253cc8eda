"""Link functions mapping untransformed function samples to the output space.

Mirrors reference ``src/projected_langevin_sampling/link_functions.py:6-80``
(Identity / Sigmoid / Probit / Square, with the same jitter clipping for the
probability links). Implemented as frozen plain dataclasses so they are
hashable and can live as *static* (non-pytree) fields inside the cost
structs — their transforms trace cleanly under jit and are differentiable
with jax.grad.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

Array = jax.Array


class PLSLinkFunction(ABC):
    @abstractmethod
    def transform(self, y: Array) -> Array:
        raise NotImplementedError

    def __call__(self, y: Array) -> Array:
        return self.transform(y)


@dataclasses.dataclass(frozen=True)
class IdentityLinkFunction(PLSLinkFunction):
    """Output space R (regression). Reference ``link_functions.py:49-56``."""

    def transform(self, y: Array) -> Array:
        return y


@dataclasses.dataclass(frozen=True)
class SigmoidLinkFunction(PLSLinkFunction):
    """Output space (0, 1), clipped to [jitter, 1-jitter].
    Reference ``link_functions.py:59-70``."""

    jitter: float = 1e-10

    def transform(self, y: Array) -> Array:
        return jnp.clip(jax.nn.sigmoid(y), self.jitter, 1.0 - self.jitter)


@dataclasses.dataclass(frozen=True)
class ProbitLinkFunction(PLSLinkFunction):
    """Standard-normal CDF via erf, clipped. Reference ``link_functions.py:30-46``."""

    jitter: float = 1e-10

    def transform(self, y: Array) -> Array:
        cdf = 0.5 * (1.0 + jax.lax.erf(y / jnp.sqrt(jnp.asarray(2.0, dtype=y.dtype))))
        return jnp.clip(cdf, self.jitter, 1.0 - self.jitter)


@dataclasses.dataclass(frozen=True)
class SquareLinkFunction(PLSLinkFunction):
    """Output space R+ (e.g. Poisson rates). Reference ``link_functions.py:73-80``."""

    def transform(self, y: Array) -> Array:
        return jnp.square(y)
