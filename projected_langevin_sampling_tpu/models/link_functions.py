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


def _probability_clip(p: Array, jitter: float) -> Array:
    """Clip to [jitter, 1 - jitter] with a DTYPE-AWARE floor on the jitter.

    The reference's 1e-10 jitter (``link_functions.py:59-70``) assumes
    float64; in float32 ``1 - 1e-10`` rounds to exactly 1.0, the upper clip
    becomes a no-op, a saturated sigmoid/probit yields p == 1.0 and the
    Bernoulli cost's log(1 - p) is -inf — which poisons the energy trace and
    makes the step-size search discard every candidate. Raising the
    effective jitter to the dtype's epsilon keeps 1 - jitter strictly below
    1 (and jitter strictly above 0) in every working precision; in float64
    the floor (2.2e-16) is below 1e-10, so reference semantics are
    unchanged."""
    eps = jnp.finfo(p.dtype).eps
    jit = jnp.maximum(jnp.asarray(jitter, dtype=p.dtype), eps)
    return jnp.clip(p, jit, 1.0 - jit)


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
        return _probability_clip(jax.nn.sigmoid(y), self.jitter)


@dataclasses.dataclass(frozen=True)
class ProbitLinkFunction(PLSLinkFunction):
    """Standard-normal CDF via erf, clipped. Reference ``link_functions.py:30-46``."""

    jitter: float = 1e-10

    def transform(self, y: Array) -> Array:
        cdf = 0.5 * (1.0 + jax.lax.erf(y / jnp.sqrt(jnp.asarray(2.0, dtype=y.dtype))))
        return _probability_clip(cdf, self.jitter)


@dataclasses.dataclass(frozen=True)
class SquareLinkFunction(PLSLinkFunction):
    """Output space R+ (e.g. Poisson rates). Reference ``link_functions.py:73-80``."""

    def transform(self, y: Array) -> Array:
        return jnp.square(y)
