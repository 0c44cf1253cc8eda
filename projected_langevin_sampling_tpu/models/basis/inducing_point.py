"""Inducing-point (non-orthonormal) basis. Reference ``basis/inducing_point.py:11-240``.

Build time (host, once):
  * grams r(Z,Z), k(Z,Z), k(Z,X);
  * Cholesky of k(Z,Z) -> explicit inverse K^{-1} and the train projection
    P = k(X,Z) k(Z,Z)^{-1}  (N, M) — the reference instead runs a
    ``gpytorch.solve`` every step (``inducing_point.py:89-93,130-132``);
  * PSD square root of k(Z,Z) for the update noise e ~ N(0, k(Z,Z)) — the
    reference re-eighs k(Z,Z) every step (``inducing_point.py:133-137``).

Hot loop: two matmuls on the MXU plus the noise matmul.
"""

from __future__ import annotations



import flax.struct
import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.ops.kernels import PLSKernel, ard_gram
from projected_langevin_sampling_tpu.ops.linalg import (
    psd_sqrt_host,
    robust_cholesky,
    sample_multivariate_normal,
)
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


@flax.struct.dataclass
class InducingPointBasis(PLSBasisMixin):
    kernel: PLSKernel
    x_induce: Array  # (M, D)
    y_induce: Array  # (M,)
    gram_induce: Array  # r(Z, Z), (M, M)
    base_gram_induce: Array  # k(Z, Z), (M, M)
    base_gram_induce_train: Array  # k(Z, X), (M, N)
    inv_base_gram_induce: Array  # k(Z, Z)^{-1}, (M, M)
    train_projection: Array  # k(X,Z) k(Z,Z)^{-1}, (N, M)
    noise_factor: Array  # S with S S^T = k(Z, Z), (M, M)
    additional_predictive_noise_distribution: object | None = flax.struct.field(
        pytree_node=False, default=None
    )
    # Prior mean constant m0 of the latent function (see OrthonormalBasis);
    # default 0.0 == reference parity. Static so tiers can branch under jit.
    mean_constant: float = flax.struct.field(pytree_node=False, default=0.0)

    @property
    def approximation_dimension(self) -> int:
        """M — the number of inducing points (reference ``inducing_point.py:52-58``)."""
        return self.x_induce.shape[0]

    @property
    def dtype(self):
        return self.base_gram_induce.dtype

    # --- particle initialisation -------------------------------------------
    def _initialise_particles(
        self,
        number_of_particles: int,
        noise_only: bool = True,
        key: KeyArray | int | None = None,
    ) -> Array:
        """Noise, optionally recentred on y(Z) (reference ``inducing_point.py:60-79``).
        Particles are the CENTRED latent values f(Z) - m0, so the y-recentred
        init subtracts the prior mean constant (m0 == 0 in the reference)."""
        noise = self._initialise_particles_noise(
            number_of_particles=number_of_particles, key=key
        )
        if noise_only:
            return noise
        return (self.y_induce - self.mean_constant)[:, None] + noise

    # --- hot loop ------------------------------------------------------------
    def calculate_untransformed_train_prediction_samples(self, particles: Array) -> Array:
        """F = m0 + k(X,Z) k(Z,Z)^{-1} U = m0 + P @ U, (N, J)
        (``inducing_point.py:81-93``; m0 == 0 in the reference)."""
        pred = self.train_projection @ particles
        if self.mean_constant != 0.0:
            pred = pred + self.mean_constant
        return pred

    def calculate_energy_potential(self, particles: Array, cost: Array) -> Array:
        """mean_j [ cost_j + M/2 ||k(Z,Z)^{-1} U_j||^2 ] (``inducing_point.py:95-115``)."""
        kinv_u = self.inv_base_gram_induce @ particles  # (M, J)
        prior = 0.5 * self.approximation_dimension * jnp.sum(jnp.square(kinv_u), axis=0)
        return jnp.mean(cost + prior)

    def sample_update_noise(self, number_of_particles: int, key: KeyArray) -> Array:
        """e ~ N(0, k(Z,Z)) via the precomputed PSD factor
        (reference re-factorises every step, ``inducing_point.py:133-137``)."""
        z = jax.random.normal(
            key, (self.approximation_dimension, number_of_particles), dtype=self.dtype
        )
        return self.noise_factor @ z

    def _calculate_particle_update(
        self,
        particles: Array,
        cost_derivative: Array,
        step_size: float,
        noise: Array,
    ) -> Array:
        """-eta k(Z,X) dc - eta M k(Z,Z)^{-1} U + sqrt(2 eta) e
        (reference ``inducing_point.py:117-150``)."""
        drift_data = self.base_gram_induce_train @ cost_derivative  # (M, J)
        drift_prior = self.approximation_dimension * (
            self.inv_base_gram_induce @ particles
        )
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
    ) -> Array:
        """G([Z, x]) ~ N(0, r([Z,x],[Z,x])) with Z-union-x augmentation on the
        cross/test blocks only, exactly as the reference assembles it
        (``inducing_point.py:152-202`` — the top-left block is the *stored*
        unaugmented r(Z,Z))."""
        key = as_key(key)
        aug = x if augmentation_samples is None else augmentation_samples
        gram_x = self.kernel.forward(x1=x, x2=x, additional_approximation_samples=aug)
        gram_induce_x = self.kernel.forward(
            x1=self.x_induce, x2=x, additional_approximation_samples=aug
        )
        noise_covariance = jnp.block(
            [[self.gram_induce, gram_induce_x], [gram_induce_x.T, gram_x]]
        )  # (M + N*, M + N*)
        key, subkey = jax.random.split(key)
        predictive_noise = sample_multivariate_normal(
            subkey,
            mean=jnp.zeros(noise_covariance.shape[0], dtype=self.dtype),
            cov=noise_covariance,
            size=(particles.shape[1],),
        ).T  # (M + N*, J)
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
        """G(x) + r(x,Z) r(Z,Z)^{-1} (U - G(Z)) (reference ``inducing_point.py:204-240``).

        The solve uses the *augmented* r(Z,Z) like the reference, factored with
        escalating jitter (the gpytorch.solve behaviour the reference relies on).
        """
        aug = x if augmentation_samples is None else augmentation_samples
        gram_x_induce = self.kernel.forward(
            x1=x, x2=self.x_induce, additional_approximation_samples=aug
        )  # (N*, M)
        gram_induce_aug = self.kernel.forward(
            x1=self.x_induce, x2=self.x_induce, additional_approximation_samples=aug
        )  # (M, M)
        if noise is None:
            noise = self.sample_predictive_noise(
                particles=particles, x=x, key=key,
                augmentation_samples=augmentation_samples,
            )
        m = self.approximation_dimension
        rhs = particles - noise[:m, :]
        if isinstance(gram_induce_aug, jax.core.Tracer):
            # Under trace (the chunked serving path jit-vmaps this method) the
            # host-side escalating-jitter Cholesky cannot run; solve via eigh
            # with an eigenvalue floor instead — the same PSD guard
            # sample_multivariate_normal applies, and vmap turns it into one
            # batched eigh across chunks on device.
            w, v = jnp.linalg.eigh(gram_induce_aug)
            floor = jnp.finfo(gram_induce_aug.dtype).eps * jnp.max(jnp.abs(w))
            w = jnp.maximum(w, floor)
            solved = v @ ((v.T @ rhs) / w[:, None])
        else:
            chol, _ = robust_cholesky(gram_induce_aug)
            solved = jax.scipy.linalg.cho_solve((chol, True), rhs)
        out = noise[m:, :] + gram_x_induce @ solved
        if self.mean_constant != 0.0:
            out = out + self.mean_constant
        return out


def build_inducing_point_basis(
    kernel: PLSKernel,
    x_induce: Array,
    y_induce: Array,
    x_train: Array,
    additional_predictive_noise_distribution: object | None = None,
    mean_constant: float = 0.0,
) -> InducingPointBasis:
    """Host-side constructor (reference ``inducing_point.py:23-50`` plus the
    factorisations the reference defers to the hot loop)."""
    x_induce = jnp.asarray(x_induce)
    if x_induce.ndim == 1:
        x_induce = x_induce[:, None]
    x_train = jnp.asarray(x_train)
    if x_train.ndim == 1:
        x_train = x_train[:, None]
    y_induce = jnp.asarray(y_induce)

    gram_induce = kernel.forward(x1=x_induce, x2=x_induce)  # r(Z, Z)
    base_gram_induce = ard_gram(kernel.base_kernel, x_induce, x_induce)  # k(Z, Z)
    base_gram_induce_train = ard_gram(kernel.base_kernel, x_induce, x_train)  # k(Z, X)

    chol, _ = robust_cholesky(base_gram_induce)
    eye = jnp.eye(base_gram_induce.shape[0], dtype=base_gram_induce.dtype)
    inv_base_gram_induce = jax.scipy.linalg.cho_solve((chol, True), eye)
    train_projection = jax.scipy.linalg.cho_solve(
        (chol, True), base_gram_induce_train
    ).T  # (N, M)
    noise_factor = psd_sqrt_host(base_gram_induce)

    return InducingPointBasis(
        kernel=kernel,
        x_induce=x_induce,
        y_induce=y_induce,
        gram_induce=gram_induce,
        base_gram_induce=base_gram_induce,
        base_gram_induce_train=base_gram_induce_train,
        inv_base_gram_induce=inv_base_gram_induce,
        train_projection=train_projection,
        noise_factor=noise_factor,
        additional_predictive_noise_distribution=additional_predictive_noise_distribution,
        mean_constant=float(mean_constant),
    )
