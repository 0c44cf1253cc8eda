"""GP likelihoods for the baseline models.

The reference leans on gpytorch likelihood objects
(``experiments/trainers.py``: GaussianLikelihood, BernoulliLikelihood,
StudentTLikelihood). Here each likelihood is a flax.struct pytree providing:

  * ``expected_log_prob(y, mean_f, var_f)`` — E_{f~N(mean_f, var_f)}[log p(y|f)]
    for the SVGP ELBO (closed form for Gaussian; Gauss-Hermite quadrature for
    Bernoulli/Student-T, matching gpytorch's quadrature approach);
  * ``marginal(mean_f, var_f)`` — the predictive distribution over y.

Scalar parameters are stored as raw positive leaves; trainers optimise their
logs.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.distributions import (
    Bernoulli,
    MultivariateNormal,
    StudentTMarginals,
    student_t_log_normalizer,
)

Array = jax.Array

_GH_POINTS = 20


def _gauss_hermite(mean_f: Array, var_f: Array, log_prob_fn) -> Array:
    """E_{f ~ N(mean_f, var_f)}[log_prob_fn(f)] via Gauss-Hermite quadrature
    (physicists' convention), per data point."""
    nodes, weights = np.polynomial.hermite.hermgauss(_GH_POINTS)
    nodes = jnp.asarray(nodes, dtype=mean_f.dtype)
    weights = jnp.asarray(weights / np.sqrt(np.pi), dtype=mean_f.dtype)
    # f = mean + sqrt(2 var) * node, shape (N, Q)
    f = mean_f[:, None] + jnp.sqrt(2.0 * var_f)[:, None] * nodes[None, :]
    return jnp.sum(log_prob_fn(f) * weights[None, :], axis=1)


@flax.struct.dataclass
class GaussianLikelihood:
    noise: Array  # noise variance sigma^2 (scalar)

    def expected_log_prob(self, y: Array, mean_f: Array, var_f: Array) -> Array:
        """Closed form: log N(y | mean_f, noise) - var_f / (2 noise)."""
        return (
            -0.5 * jnp.log(2.0 * jnp.pi * self.noise)
            - 0.5 * jnp.square(y - mean_f) / self.noise
            - 0.5 * var_f / self.noise
        )

    def marginal(self, mean_f: Array, var_f: Array) -> MultivariateNormal:
        return MultivariateNormal(mean=mean_f, variance=var_f + self.noise)

    def log_prob(self, y: Array, f: Array) -> Array:
        return -0.5 * (jnp.log(2.0 * jnp.pi * self.noise) + jnp.square(y - f) / self.noise)


@flax.struct.dataclass
class BernoulliLikelihood:
    """Probit Bernoulli likelihood (gpytorch's BernoulliLikelihood default)."""

    def log_prob(self, y: Array, f: Array) -> Array:
        # y in {0, 1}; log Phi(f)^y (1-Phi(f))^{1-y} = log Phi((2y-1) f)
        z = (2.0 * y - 1.0)[:, None] if f.ndim == 2 else (2.0 * y - 1.0)
        return jax.scipy.stats.norm.logcdf(z * f)

    def expected_log_prob(self, y: Array, mean_f: Array, var_f: Array) -> Array:
        return _gauss_hermite(mean_f, var_f, lambda f: self.log_prob(y, f))

    def marginal(self, mean_f: Array, var_f: Array) -> Bernoulli:
        """p(y=1) = Phi(mean / sqrt(1 + var)) — exact probit integral."""
        probs = jax.scipy.stats.norm.cdf(mean_f / jnp.sqrt(1.0 + var_f))
        return Bernoulli(probs=probs)


@flax.struct.dataclass
class StudentTLikelihood:
    noise: Array  # scale^2 analogue (scalar), optimised in log-space
    degrees_of_freedom: float = flax.struct.field(pytree_node=False, default=4.0)

    def log_prob(self, y: Array, f: Array) -> Array:
        df = self.degrees_of_freedom
        scale = jnp.sqrt(self.noise)
        yy = y[:, None] if f.ndim == 2 and y.ndim == 1 else y
        z = (yy - f) / scale
        # host-fp64 normalizer: the on-device lgamma difference cancels
        # catastrophically in fp32 for the large dfs t.fit produces.
        log_norm = jnp.asarray(student_t_log_normalizer(df), dtype=f.dtype)
        return (
            log_norm
            - jnp.log(scale)
            - ((df + 1.0) / 2.0) * jnp.log1p(jnp.square(z) / df)
        )

    def expected_log_prob(self, y: Array, mean_f: Array, var_f: Array) -> Array:
        return _gauss_hermite(mean_f, var_f, lambda f: self.log_prob(y, f))

    def marginal(self, mean_f: Array, var_f: Array) -> StudentTMarginals:
        """Student-T marginals centred on the latent mean, with the latent
        variance folded in by moment matching: a scale ``s`` such that the
        marginal's variance ``s^2 df/(df-2)`` equals the total predictive
        variance ``var_f + noise*df/(df-2)``, i.e.
        ``s^2 = noise + var_f (df-2)/df`` (``noise + var_f`` for df <= 2,
        where the variance is undefined and we match the Gaussian limit).

        The reference integrates the latent via gpytorch's sampled marginals
        (``experiments/metrics.py:178``: ``model.likelihood(model(data.x))``)
        but then reports the *positive* mean log-prob as "NLL"
        (``metrics.py:98-99`` returns ``prediction.log_prob(y).mean()``
        without negation — a sign bug). We keep an honest NLL and fold the
        latent in by moment matching instead; documented in PARITY.md.
        """
        df = self.degrees_of_freedom
        latent_factor = (df - 2.0) / df if df > 2.0 else 1.0
        scale = jnp.sqrt(self.noise + var_f * latent_factor)
        return StudentTMarginals(
            df=self.degrees_of_freedom, loc=mean_f, scale=scale
        )
