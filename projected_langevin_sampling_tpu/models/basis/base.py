"""Basis layer: shared behaviour for function-space approximations.

Mirrors reference ``src/projected_langevin_sampling/basis/base.py:7-193``.
Concrete bases are flax.struct pytrees built once on the host (where the
O(M^3) eigh/Cholesky happens — see the builders in ``orthonormal.py`` /
``inducing_point.py``) and then ride through jit/lax.scan: the hot-loop
methods are pure functions of (basis, particles, noise).

Design departure from the reference, same math: the reference re-factorises
constant covariances every Langevin step (``samplers.py:27`` eigh per call);
here every constant factor (eigendecomposition, Cholesky, inverses,
train projections) is precomputed at build time so a training step is pure
matmul + elementwise work for the MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class PLSBasisMixin:
    """Method mixin for basis structs.

    Subclasses must provide ``approximation_dimension`` (property),
    ``_initialise_particles``, ``calculate_untransformed_train_prediction_samples``,
    ``calculate_energy_potential``, ``_calculate_particle_update``,
    ``sample_update_noise``, ``sample_predictive_noise`` and
    ``predict_untransformed_samples``.
    """

    def _initialise_particles_noise(
        self,
        number_of_particles: int,
        key: KeyArray | int | None = None,
        mean: float = 0.0,
        stdev: float = 1.0,
    ) -> Array:
        """Standard-normal (M, J) init noise (reference ``basis/base.py:38-63``)."""
        key = as_key(key)
        return mean + stdev * jax.random.normal(
            key, (self.approximation_dimension, number_of_particles), dtype=self.dtype
        )

    def initialise_particles(
        self,
        number_of_particles: int,
        noise_only: bool = True,
        key: KeyArray | int | None = None,
    ) -> Array:
        """(M, J) initial particles (reference ``basis/base.py:81-104``)."""
        return self._initialise_particles(
            number_of_particles=number_of_particles,
            noise_only=noise_only,
            key=key,
        )

    def calculate_particle_update(
        self,
        particles: Array,
        cost_derivative: Array,
        step_size: float,
        noise: Array | None = None,
        key: KeyArray | int | None = None,
    ) -> Array:
        """Shape-checked update wrapper (reference ``basis/base.py:143-168``).

        ``noise`` may be injected for deterministic parity testing (the
        reference's analogous hook is noise injection at prediction time,
        ``projected_langevin_sampling.py:140-163``); otherwise it is drawn
        from this basis's update-noise distribution using ``key``.
        """
        assert particles.shape[0] == self.approximation_dimension, (
            f"Particles have shape {particles.shape} but requires "
            f"({self.approximation_dimension}, J) dimension."
        )
        if noise is None:
            noise = self.sample_update_noise(
                number_of_particles=particles.shape[1], key=as_key(key)
            )
        return self._calculate_particle_update(
            particles=particles,
            cost_derivative=cost_derivative,
            step_size=step_size,
            noise=noise,
        )

    def _sample_additional_predictive_noise(
        self, key: KeyArray, shape: tuple[int, ...]
    ) -> Array | None:
        dist = getattr(self, "additional_predictive_noise_distribution", None)
        if dist is None:
            return None
        return dist.sample(key, shape, dtype=self.dtype)
