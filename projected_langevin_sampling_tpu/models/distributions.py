"""Lightweight predictive-distribution containers.

The reference returns gpytorch/torch distribution objects from
``cost.predict`` (``costs/gaussian.py:40-52``, ``costs/bernoulli.py:34-46``,
``costs/poisson.py:34-45``) and a custom ``StudentTMarginals`` dataclass
(``src/distributions.py:8-42``). Here these are flax.struct pytrees carrying
the minimal sufficient statistics plus the NLL / log-prob methods the metrics
layer needs, so they can cross jit boundaries.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

Array = jax.Array


def student_t_log_normalizer(df: float) -> float:
    """``log Gamma((df+1)/2) - log Gamma(df/2) - 0.5 log(df*pi)``, on host in
    float64.

    Evaluating the two lgammas on device in the compute dtype catastrophically
    cancels for large df (their magnitudes grow like ``df*log(df)`` while the
    difference stays O(log df)): at df ~ 1e12 — which ``scipy.stats.t.fit``
    happily returns for near-Gaussian residuals — the float32 error is ~14
    nats, which silently inflated every ``svgp-student`` NLL in the round-3
    UCI tables. df is a static (non-pytree) field everywhere, so the constant
    can always be computed on host. For df > 1e6 even float64 loses the
    difference, so switch to the asymptotic expansion
    ``log Gamma(x+1/2) - log Gamma(x) = 0.5 log x - 1/(8x) + O(x^-2)``
    (x = df/2), which collapses to the Gaussian limit
    ``-0.5 log(2 pi) - 1/(4 df)``.
    """
    df = float(df)
    if df > 1e6:
        return -0.5 * math.log(2.0 * math.pi) - 1.0 / (4.0 * df)
    return (
        math.lgamma((df + 1.0) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
    )


@flax.struct.dataclass
class MultivariateNormal:
    """Moment-matched Gaussian predictive with diagonal covariance.

    Matches reference ``gpytorch.distributions.MultivariateNormal(mean, diag(var))``
    as constructed at ``costs/gaussian.py:40-52``. Stores the diagonal; the
    full matrix is materialised on demand.
    """

    mean: Array  # (N,)
    variance: Array  # (N,)

    @property
    def covariance_matrix(self) -> Array:
        return jnp.diag(self.variance)

    @property
    def stddev(self) -> Array:
        return jnp.sqrt(self.variance)

    def log_prob_marginals(self, y: Array) -> Array:
        """Per-point Gaussian log-density (N,)."""
        var = self.variance
        return -0.5 * (jnp.log(2.0 * jnp.pi * var) + jnp.square(y - self.mean) / var)

    def negative_log_likelihood(self, y: Array) -> Array:
        """Mean marginal NLL — the regression metric used by the reference's
        ``gpytorch.metrics.mean_standardized_log_loss``-style reporting."""
        return -jnp.mean(self.log_prob_marginals(y))


@flax.struct.dataclass
class Bernoulli:
    probs: Array  # (N,)

    @property
    def mean(self) -> Array:
        return self.probs

    def log_prob(self, y: Array) -> Array:
        p = self.probs
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)

    def negative_log_likelihood(self, y: Array) -> Array:
        return -jnp.mean(self.log_prob(y))


@flax.struct.dataclass
class Poisson:
    rate: Array  # (N,)

    @property
    def mean(self) -> Array:
        return self.rate

    def log_prob(self, y: Array) -> Array:
        return y * jnp.log(self.rate) - self.rate - jax.lax.lgamma(y + 1.0)

    def negative_log_likelihood(self, y: Array) -> Array:
        return -jnp.mean(self.log_prob(y))


@flax.struct.dataclass
class StudentTMarginals:
    """Per-point Student-T marginals with shared degrees of freedom.

    Reference ``src/distributions.py:8-42`` computes the NLL with a Python
    loop over gpytorch StudentT objects; here it is one vectorised
    log-density evaluation.
    """

    df: float = flax.struct.field(pytree_node=False)
    loc: Array  # (N,)
    scale: Array  # (N,)

    @property
    def mean(self) -> Array:
        return self.loc

    @property
    def variance(self) -> Array:
        """scale^2 df/(df-2) for df > 2; scale^2 otherwise (finite fallback,
        used when tempering wraps a Student-T PLS in debug mode)."""
        if self.df > 2:
            return jnp.square(self.scale) * (self.df / (self.df - 2.0))
        return jnp.square(self.scale)

    @property
    def covariance_matrix(self) -> Array:
        return jnp.diag(self.variance)

    def log_prob(self, y: Array) -> Array:
        df = jnp.asarray(self.df, dtype=self.loc.dtype)
        z = (y - self.loc) / self.scale
        # df-only normalizer on host in fp64 — the on-device lgamma difference
        # cancels catastrophically in fp32 for the huge dfs t.fit returns on
        # near-Gaussian residuals (see student_t_log_normalizer).
        log_norm = jnp.asarray(
            student_t_log_normalizer(self.df), dtype=self.loc.dtype
        )
        return (
            log_norm
            - jnp.log(self.scale)
            - ((df + 1.0) / 2.0) * jnp.log1p(jnp.square(z) / df)
        )

    def negative_log_likelihood(self, y: Array) -> Array:
        return -jnp.mean(self.log_prob(y))
