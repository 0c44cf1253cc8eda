"""Orthonormal (KKL eigen-) basis. Reference ``basis/orthonormal.py:10-244``.

Build time (host, once — the O(M^3) step of reference §3.5):
  * eigh((1/M) k(Z,Z)), drop eigenpairs with eigenvalue <= threshold
    (data-dependent M_k is resolved HERE so every jitted shape is static);
  * scaled eigenvectors  Vt = V / sqrt(M_k * lambda)            (M, M_k)
  * train projection     B  = k(Z,X)^T @ Vt                     (N, M_k)

Hot loop (pure, jittable — two MXU matmuls + VPU elementwise):
  * train predictions    F  = B @ U                             (N, J)
  * particle update      dU = -eta B^T dc(F) - eta U/lambda + sqrt(2 eta) eps,
    eps ~ N(0, I) drawn iid (the reference runs a full eigh of the *identity*
    for this every step, ``orthonormal.py:140-145`` — same distribution).
"""

from __future__ import annotations



import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.ops.kernels import PLSKernel, ard_gram
from projected_langevin_sampling_tpu.ops.linalg import sample_multivariate_normal
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


@flax.struct.dataclass
class OrthonormalBasis(PLSBasisMixin):
    kernel: PLSKernel
    x_induce: Array  # (M, D)
    eigenvalues: Array  # (M_k,)
    scaled_eigenvectors: Array  # (M, M_k)
    base_gram_induce_train: Array  # k(Z, X), (M, N)
    train_projection: Array  # B = k(Z,X)^T @ Vt, (N, M_k)
    additional_predictive_noise_distribution: object | None = flax.struct.field(
        pytree_node=False, default=None
    )
    # eigenvector scaling mode (static):
    #   "reference" — Vt = V / sqrt(M_k * lambda), the reference's formula
    #     (``orthonormal.py:62-68``). Implied function-space prior variance is
    #     r(x,x) = (1/M) k(x,Z) k(Z,x), which can UNDERESTIMATE k(x,x) badly
    #     for smooth kernels (see DESIGN.md "ONB prior scaling").
    #   "nystrom" — Vt = V / (sqrt(M) * lambda), the consistent empirical-KKL
    #     scaling: Vt Lambda Vt^T == Kzz^{-1} (truncated), so the implied prior
    #     is the Nystrom approximation Qff = k(x,Z) Kzz^{-1} k(Z,x) ~= k(x,x)
    #     and the stationary posterior mean equals the Titsias-optimal SVGP
    #     mean for Gaussian likelihoods. Opt-in extension (not reference
    #     behaviour).
    scaling: str = flax.struct.field(pytree_node=False, default="reference")
    # Prior mean constant m0 of the latent function: f(x) = m0 + sum_i phi_i(x) U_i
    # with U zero-mean. The reference's PLS prior is zero-mean (its GP baselines
    # learn a ConstantMean, ``experiments/constructors.py:44-53``, which the
    # reference passes to SVGP but NOT to PLS); default 0.0 keeps reference
    # parity. Static (non-pytree) so training tiers can branch on it under jit.
    mean_constant: float = flax.struct.field(pytree_node=False, default=0.0)

    @property
    def approximation_dimension(self) -> int:
        """M_k — number of kept eigenpairs (reference ``orthonormal.py:70-76``)."""
        return self.eigenvalues.shape[0]

    @property
    def dtype(self):
        return self.eigenvalues.dtype

    @property
    def eigenvectors(self) -> Array:
        """Unscaled eigenvectors V (the reference stores these separately,
        ``orthonormal.py:46-60``; used e.g. by the mixture experiment's custom
        particle init). Inverts whichever scaling built Vt."""
        if self.scaling == "nystrom":
            scale = jnp.sqrt(jnp.asarray(self.x_induce.shape[0], self.dtype))
            return self.scaled_eigenvectors * (scale * self.eigenvalues)[None, :]
        scale = jnp.sqrt(self.approximation_dimension * self.eigenvalues)
        return self.scaled_eigenvectors * scale[None, :]

    # --- particle initialisation -------------------------------------------
    def _initialise_particles(
        self,
        number_of_particles: int,
        noise_only: bool = True,
        key: KeyArray | int | None = None,
    ) -> Array:
        if not noise_only:
            raise ValueError("For ONB base, noise_only must be True.")
        return self._initialise_particles_noise(
            number_of_particles=number_of_particles, key=key
        )

    # --- hot loop ------------------------------------------------------------
    def calculate_untransformed_train_prediction_samples(self, particles: Array) -> Array:
        """F = m0 + k(X,Z) Vt U = m0 + B @ U, (N, J) (reference ``orthonormal.py:98-108``;
        m0 == 0 in the reference)."""
        pred = self.train_projection @ particles
        if self.mean_constant != 0.0:
            pred = pred + self.mean_constant
        return pred

    def calculate_energy_potential(self, particles: Array, cost: Array) -> Array:
        """mean_j [ cost_j + 1/2 U_j^T Lambda^{-1} U_j ] (``orthonormal.py:110-126``)."""
        prior = 0.5 * jnp.sum(
            jnp.square(particles) / self.eigenvalues[:, None], axis=0
        )
        return jnp.mean(cost + prior)

    def sample_update_noise(self, number_of_particles: int, key: KeyArray) -> Array:
        """eps ~ N(0, I_{M_k}) — identical in distribution to the reference's
        eigh-of-identity sampling (``orthonormal.py:140-145``)."""
        return jax.random.normal(
            key, (self.approximation_dimension, number_of_particles), dtype=self.dtype
        )

    def _calculate_particle_update(
        self,
        particles: Array,
        cost_derivative: Array,
        step_size: float,
        noise: Array,
    ) -> Array:
        """-eta Vt^T k(Z,X) dc - eta Lambda^{-1} U + sqrt(2 eta) eps
        (reference ``orthonormal.py:128-159``)."""
        drift_data = self.train_projection.T @ cost_derivative  # (M_k, J)
        drift_prior = particles / self.eigenvalues[:, None]
        return (
            -step_size * drift_data
            - step_size * drift_prior
            + jnp.sqrt(2.0 * jnp.asarray(step_size, dtype=noise.dtype)) * noise
        )

    # --- prediction (cold path) ----------------------------------------------
    def sample_predictive_noise(
        self,
        particles: Array,
        x: Array,
        key: KeyArray | int | None = None,
        augmentation_samples: Array | None = None,
        base_gram_x_induce: Array | None = None,
    ) -> Array:
        """Joint MVN draw over [basis coefficients; test function values]
        with the Z-union-x augmentation (reference ``orthonormal.py:161-214``).

        ``augmentation_samples`` only affects the ``"reference"`` scaling —
        under ``"nystrom"`` the bottom-right block is the exact base gram, so
        the OOD augmentation is moot and the argument is ignored.
        ``base_gram_x_induce``: optional precomputed k(x, Z) (the caller may
        already hold it — ``predict_untransformed_samples`` does)."""
        key = as_key(key)
        if self.scaling == "nystrom":
            # the consistent prior: marginal var of the Matheron prediction is
            # exactly k(x,x) (Vt Lambda Vt^T == Kzz^{-1} makes the correction
            # terms cancel), so the bottom-right block is the exact base gram
            gram_x = ard_gram(self.kernel.base_kernel, x, x)
        else:
            # r(x, x) with augmented approximation samples for OOD fidelity
            aug = x if augmentation_samples is None else augmentation_samples
            gram_x = self.kernel.forward(
                x1=x, x2=x, additional_approximation_samples=aug
            )
        if base_gram_x_induce is None:
            base_gram_x_induce = ard_gram(self.kernel.base_kernel, x, self.x_induce)
        off_diagonal_block = (
            base_gram_x_induce @ self.scaled_eigenvectors * self.eigenvalues[None, :]
        )  # (N*, M_k) == k(x,Z) Vt diag(lambda)
        lam = jnp.diag(self.eigenvalues)
        noise_covariance = jnp.block(
            [[lam, off_diagonal_block.T], [off_diagonal_block, gram_x]]
        )  # (M_k + N*, M_k + N*)
        key, subkey = jax.random.split(key)
        predictive_noise = sample_multivariate_normal(
            subkey,
            mean=jnp.zeros(noise_covariance.shape[0], dtype=self.dtype),
            cov=noise_covariance,
            size=(particles.shape[1],),
        ).T  # (M_k + N*, J)
        extra = self._sample_additional_predictive_noise(key, predictive_noise.shape)
        if extra is not None:
            predictive_noise = predictive_noise + extra
        return predictive_noise

    def predict_untransformed_samples(
        self,
        particles: Array,
        x: Array,
        noise: Array | None = None,
        key: KeyArray | int | None = None,
        augmentation_samples: Array | None = None,
    ) -> Array:
        """Matheron pathwise conditioning: noise_x + k(x,Z) Vt (U - noise_Z)
        (reference ``orthonormal.py:216-244``)."""
        base_gram_x_induce = ard_gram(self.kernel.base_kernel, x, self.x_induce)
        if noise is None:
            noise = self.sample_predictive_noise(
                particles=particles, x=x, key=key,
                augmentation_samples=augmentation_samples,
                base_gram_x_induce=base_gram_x_induce,  # computed once
            )
        m_k = self.approximation_dimension
        out = noise[m_k:, :] + base_gram_x_induce @ (
            self.scaled_eigenvectors @ (particles - noise[:m_k, :])
        )
        if self.mean_constant != 0.0:
            out = out + self.mean_constant
        return out


def build_orthonormal_basis(
    kernel: PLSKernel,
    x_induce: Array,
    x_train: Array,
    eigenvalue_threshold: float = 0.0,
    additional_predictive_noise_distribution: object | None = None,
    verbose: bool = True,
    scaling: str = "reference",
    relative_eigenvalue_threshold: float | None = None,
    mean_constant: float = 0.0,
) -> OrthonormalBasis:
    """Host-side constructor — the O(M^3) step (reference ``orthonormal.py:22-68``).

    The eigh and data-dependent eigenvalue thresholding happen eagerly here so
    that M_k is a static shape for everything downstream.

    ``scaling``: "reference" reproduces the reference's eigenvector scaling
    V/sqrt(M_k*lambda); "nystrom" is the consistent empirical-KKL scaling
    V/(sqrt(M)*lambda) whose implied function-space prior is the Nystrom
    approximation of k — see the OrthonormalBasis field docs and DESIGN.md.

    ``relative_eigenvalue_threshold``: drop eigenpairs with
    lambda <= rel * lambda_max (overrides ``eigenvalue_threshold`` when
    larger). Standard truncated-Nystrom practice and practically REQUIRED
    with scaling="nystrom" on ill-conditioned k(Z,Z): the 1/lambda basis
    columns make the Langevin stiffness scale as (N/sigma^2)/lambda_min, so
    untruncated tiny eigenvalues put the stable step size below any
    practical grid (see results/onb_scaling_comparison.md).
    """
    import numpy as np

    x_induce = jnp.asarray(x_induce)
    if x_induce.ndim == 1:
        x_induce = x_induce[:, None]
    x_train = jnp.asarray(x_train)
    if x_train.ndim == 1:
        x_train = x_train[:, None]

    m = x_induce.shape[0]
    base_gram_induce = ard_gram(kernel.base_kernel, x_induce, x_induce)  # (M, M)
    base_gram_induce_train = ard_gram(kernel.base_kernel, x_induce, x_train)  # (M, N)

    # host fp64 regardless of the working dtype — LAPACK ssyevd on fp32
    # inputs loses digits the thresholding below is sensitive to
    eigenvalues, eigenvectors = np.linalg.eigh(
        np.asarray(base_gram_induce, dtype=np.float64) / m
    )
    if relative_eigenvalue_threshold is not None and eigenvalues.size:
        eigenvalue_threshold = max(
            eigenvalue_threshold,
            float(relative_eigenvalue_threshold) * float(eigenvalues[-1]),
        )
    keep = np.where(eigenvalues > eigenvalue_threshold)[0]
    eigenvalues = eigenvalues[keep]
    eigenvectors = eigenvectors[:, keep]
    if verbose:
        print(f"Number of eigenvalues kept: {eigenvalues.shape[0]} out of {m}")

    m_k = eigenvalues.shape[0]
    if scaling == "nystrom":
        # Vt Lambda Vt^T == (truncated) Kzz^{-1}: prior var == Qff ~= k(x,x)
        # Guard the 1/lambda columns: a kept eigenvalue at fp64 noise level
        # (<= ~10 eps relative to lambda_max) makes 1/(sqrt(M) lambda)
        # overflow fp32 or inject garbage directions — fail fast instead of
        # silently NaN-ing the Langevin drift.
        if eigenvalues.size and float(eigenvalues[0]) <= 10.0 * np.finfo(
            np.float64
        ).eps * float(eigenvalues[-1]):
            raise ValueError(
                'scaling="nystrom" kept a numerically-zero eigenvalue '
                f"(lambda_min/lambda_max = {float(eigenvalues[0] / eigenvalues[-1]):.3e}); "
                "set relative_eigenvalue_threshold (e.g. 1e-10 or larger) to "
                "truncate the noise-level eigenpairs"
            )
        scaled_eigenvectors = eigenvectors / (np.sqrt(m) * eigenvalues)[None, :]
    elif scaling == "reference":
        scaled_eigenvectors = eigenvectors / np.sqrt(m_k * eigenvalues)[None, :]
    else:
        raise ValueError(f"Unknown ONB scaling {scaling!r}")
    # k(Z,X)^T @ Vt in fp64 (the eigh above already is): the nystrom columns
    # carry 1/lambda dynamic range, and fp32 accumulation of the cancelling
    # inner products loses the digits the host-fp64 policy protects
    train_projection = jnp.asarray(
        np.asarray(base_gram_induce_train, dtype=np.float64).T @ scaled_eigenvectors,
        dtype=base_gram_induce.dtype,
    )  # (N, M_k)
    scaled_eigenvectors = jnp.asarray(scaled_eigenvectors, dtype=base_gram_induce.dtype)
    eigenvalues = jnp.asarray(eigenvalues, dtype=base_gram_induce.dtype)

    return OrthonormalBasis(
        kernel=kernel,
        x_induce=x_induce,
        eigenvalues=eigenvalues,
        scaled_eigenvectors=scaled_eigenvectors,
        base_gram_induce_train=base_gram_induce_train,
        train_projection=train_projection,
        additional_predictive_noise_distribution=additional_predictive_noise_distribution,
        scaling=scaling,
        mean_constant=float(mean_constant),
    )
