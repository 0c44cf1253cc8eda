"""Sparse variational GP (SVGP) baseline.

Reference ``src/gaussian_process/svgp.py:6-49`` wraps gpytorch's
CholeskyVariationalDistribution + VariationalStrategy; training happens in
``experiments/trainers.py:55-136`` with a minibatched VariationalELBO. Here
the model is a pytree in the *whitened* parameterisation (the gpytorch
default): q(u) = N(L v_mean, L S L^T) with S = C C^T, L = chol(K_zz), so the
KL term is against N(0, I) and the ELBO is a handful of MXU matmuls.

PLS is provably equivalent to this model for the Gaussian likelihood
(reference README.md:10-12) — tested in ``tests/test_gp.py``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.distributions import MultivariateNormal
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
from projected_langevin_sampling_tpu.ops.linalg import psd_safe_cholesky

Array = jax.Array


@flax.struct.dataclass
class SVGP:
    mean_constant: Array  # scalar
    kernel: ARDKernel
    likelihood: object  # GaussianLikelihood / BernoulliLikelihood / StudentTLikelihood
    x_induce: Array  # (M, D)
    variational_mean: Array  # v_mean, (M,) — whitened
    variational_chol: Array  # C (lower), (M, M) — whitened, S = C C^T
    jitter: float = flax.struct.field(pytree_node=False, default=1e-8)

    @property
    def num_inducing(self) -> int:
        return self.x_induce.shape[0]

    @property
    def _chol_s(self) -> Array:
        """Lower-triangular view of the raw variational factor. Gradient
        updates densify the raw matrix; like gpytorch's
        CholeskyVariationalDistribution, only the tril is the parameter."""
        return jnp.tril(self.variational_chol)

    def _effective_jitter(self, dtype) -> float:
        """gpytorch's psd_safe_cholesky floors: 1e-6 in fp32, 1e-8 in fp64.
        The PLS r-kernel SQUARES the base kernel's spectrum, so K_zz routinely
        has eigenvalues below fp32 resolution — an un-floored 1e-8 jitter
        produces a garbage Cholesky and the whitened ELBO explodes within a
        few steps (observed on every UCI regression dataset)."""
        floor = 1e-6 if dtype == jnp.float32 else 1e-8
        return max(self.jitter, floor)

    def _chol_kzz(self) -> Array:
        # escalating-jitter factorisation (gpytorch's psd_safe_cholesky retry
        # loop): the fp32 floor alone is not enough on CPU LAPACK for
        # ill-conditioned K_zz (ops/linalg.py:psd_safe_cholesky)
        k_zz = self.kernel(self.x_induce, self.x_induce)
        return psd_safe_cholesky(k_zz, self._effective_jitter(k_zz.dtype))

    def latent(self, x: Array) -> MultivariateNormal:
        """q(f(x)) marginals: mean = m0 + A v_mean, var = k_xx - rowsum(A^2) +
        rowsum((A C)^2), with A = K_xz L^{-T}."""
        x = x[:, None] if x.ndim == 1 else x
        chol = self._chol_kzz()
        k_xz = self.kernel(x, self.x_induce)  # (N, M)
        a = jax.scipy.linalg.solve_triangular(chol, k_xz.T, lower=True).T  # (N, M)
        mean = self.mean_constant + a @ self.variational_mean
        k_diag = self.kernel(x, x, diag=True)
        ac = a @ self._chol_s
        var = k_diag - jnp.sum(jnp.square(a), axis=1) + jnp.sum(jnp.square(ac), axis=1)
        return MultivariateNormal(mean=mean, variance=jnp.maximum(var, 0.0))

    def kl_divergence(self) -> Array:
        """KL(q(u) || p(u)) in whitened coordinates: against N(0, I)."""
        c = self._chol_s
        m = self.variational_mean
        diag = jnp.diagonal(c)
        trace = jnp.sum(jnp.square(c))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(diag)))
        return 0.5 * (trace + m @ m - m.shape[0] - logdet)

    def elbo(self, x_batch: Array, y_batch: Array, num_data: int) -> Array:
        """Minibatch ELBO (the reference's ``gpytorch.mlls.VariationalELBO``):
        (N / B) sum_batch E_q[log p(y|f)] - KL."""
        q_f = self.latent(x_batch)
        ell = self.likelihood.expected_log_prob(y_batch, q_f.mean, q_f.variance)
        scale = num_data / x_batch.shape[0]
        return scale * jnp.sum(ell) - self.kl_divergence()

    def predict_y(self, x: Array):
        """Predictive over observations: likelihood marginal of q(f)
        (the reference's ``gp.likelihood(gp(x))``)."""
        q_f = self.latent(x)
        return self.likelihood.marginal(q_f.mean, q_f.variance)

    def __call__(self, x: Array) -> MultivariateNormal:
        return self.latent(x)


def init_svgp(
    mean_constant,
    kernel: ARDKernel,
    likelihood,
    x_induce: Array,
    jitter: float = 1e-8,
) -> SVGP:
    """Fresh SVGP with q(u) = N(0, I) in whitened coordinates (the gpytorch
    CholeskyVariationalDistribution initialisation)."""
    x_induce = jnp.asarray(x_induce)
    if x_induce.ndim == 1:
        x_induce = x_induce[:, None]
    m = x_induce.shape[0]
    dtype = x_induce.dtype
    return SVGP(
        mean_constant=jnp.asarray(mean_constant, dtype=dtype),
        kernel=kernel,
        likelihood=likelihood,
        x_induce=x_induce,
        variational_mean=jnp.zeros(m, dtype=dtype),
        variational_chol=jnp.eye(m, dtype=dtype),
        jitter=jitter,
    )


def titsias_optimal_svgp(svgp: SVGP, x_train: Array, y_train: Array) -> SVGP:
    """Closed-form optimal q(u) for the GAUSSIAN likelihood (Titsias 2009):

        Sigma = (K_zz + (1/sigma^2) K_zx K_xz)^{-1}
        m_u   = (1/sigma^2) K_zz Sigma K_zx (y - m0)
        S_u   = K_zz Sigma K_zz

    returned in whitened coordinates. This is the analytic target of both
    SVGP ELBO training and (per the paper) the PLS stationary distribution —
    used as the equivalence oracle in tests.
    """
    x_train = x_train[:, None] if x_train.ndim == 1 else x_train
    sigma2 = svgp.likelihood.noise
    m = svgp.num_inducing
    k_zz = svgp.kernel(svgp.x_induce, svgp.x_induce)
    k_zx = svgp.kernel(svgp.x_induce, x_train)
    jit = svgp._effective_jitter(k_zz.dtype)
    a = k_zz + (k_zx @ k_zx.T) / sigma2
    chol_a = psd_safe_cholesky(a, jit)
    resid = y_train - svgp.mean_constant
    sigma_kzx_y = jax.scipy.linalg.cho_solve((chol_a, True), k_zx @ resid) / sigma2
    m_u = k_zz @ sigma_kzx_y
    s_u = k_zz @ jax.scipy.linalg.cho_solve((chol_a, True), k_zz)

    # whiten: v = L^{-1} m_u, C = L^{-1} chol(S_u)
    chol_kzz = svgp._chol_kzz()
    v_mean = jax.scipy.linalg.solve_triangular(chol_kzz, m_u, lower=True)
    s_u = 0.5 * (s_u + s_u.T)
    chol_s = psd_safe_cholesky(s_u, jit)
    c = jax.scipy.linalg.solve_triangular(chol_kzz, chol_s, lower=True)
    return svgp.replace(variational_mean=v_mean, variational_chol=c)
