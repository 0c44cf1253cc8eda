"""Exact GP baseline. Reference ``src/gaussian_process/exact_gp.py:5-30`` plus
the gpytorch ExactMarginalLogLikelihood machinery it delegates to
(``experiments/trainers.py:15-52``).

The model is a pytree of raw parameters (constant mean, ARD kernel, noise);
the marginal log-likelihood is one Cholesky factorisation under jit, and
training (in ``experiments/trainers.py``) runs optax Adam on the log-space
parameters.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
from projected_langevin_sampling_tpu.ops.linalg import nan_rescued_cholesky

# Every reference K + sigma^2 I factorisation goes through gpytorch's
# psd_safe_cholesky retry loop implicitly (plain first, jitter escalation on
# failure), so a bare cholesky here NaNs where the reference survives —
# observed on iris_petal (exact duplicate rows + MLL-collapsed noise make
# K_noisy numerically singular in fp32). nan_rescued_cholesky keeps healthy
# inputs bit-identical to the plain factorisation.

Array = jax.Array


@flax.struct.dataclass
class ExactGP:
    """Zero/constant-mean exact GP with ARD kernel and Gaussian noise."""

    mean_constant: Array  # scalar
    kernel: ARDKernel
    noise: Array  # noise variance (scalar; the LEARNED part)
    x_train: Array  # (N, D)
    y_train: Array  # (N,)
    # optional per-point fixed heteroscedastic noise variances (N,) — the
    # gpytorch FixedNoiseGaussianLikelihood case used by the Dirichlet
    # classification transform (learned `noise` is then the additional noise)
    fixed_noise_variances: Array | None = None

    @property
    def likelihood_noise(self) -> Array:
        return self.noise

    def _noise_diag(self) -> Array:
        n = self.y_train.shape[0]
        diag = self.noise * jnp.ones(n, dtype=self.y_train.dtype)
        if self.fixed_noise_variances is not None:
            diag = diag + self.fixed_noise_variances
        return diag

    def prior(self, x: Array) -> tuple[Array, Array]:
        """Latent prior mean vector and covariance at x (reference
        ``exact_gp.py:27-30`` forward)."""
        x = x[:, None] if x.ndim == 1 else x
        mean = self.mean_constant * jnp.ones(x.shape[0], dtype=x.dtype)
        cov = self.kernel(x, x)
        return mean, cov

    def log_marginal_likelihood(self) -> Array:
        """log p(y | X) — the exact MLL the reference maximises via
        ``gpytorch.mlls.ExactMarginalLogLikelihood``."""
        n = self.y_train.shape[0]
        mean, k = self.prior(self.x_train)
        k_noisy = k + jnp.diag(self._noise_diag())
        chol = nan_rescued_cholesky(k_noisy)
        resid = self.y_train - mean
        alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (resid @ alpha + logdet + n * jnp.log(2.0 * jnp.pi))

    def predict_f(self, x: Array) -> MultivariateNormal:
        """Latent posterior p(f* | y) with diagonal covariance."""
        x = x[:, None] if x.ndim == 1 else x
        mean_train, k_train = self.prior(self.x_train)
        k_noisy = k_train + jnp.diag(self._noise_diag())
        chol = nan_rescued_cholesky(k_noisy)
        k_cross = self.kernel(x, self.x_train)  # (N*, N)
        alpha = jax.scipy.linalg.cho_solve((chol, True), self.y_train - mean_train)
        mean = self.mean_constant + k_cross @ alpha
        v = jax.scipy.linalg.solve_triangular(chol, k_cross.T, lower=True)  # (N, N*)
        var = self.kernel(x, x, diag=True) - jnp.sum(jnp.square(v), axis=0)
        return MultivariateNormal(mean=mean, variance=jnp.maximum(var, 0.0))

    def predict_y(self, x: Array) -> MultivariateNormal:
        """Predictive over observations: latent posterior + noise (the
        reference's ``gp.likelihood(gp(x))``)."""
        latent = self.predict_f(x)
        return MultivariateNormal(
            mean=latent.mean, variance=latent.variance + self.noise
        )

    def __call__(self, x: Array) -> MultivariateNormal:
        return self.predict_f(x)
