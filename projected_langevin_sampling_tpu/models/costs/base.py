"""Cost (likelihood) layer: shared behaviour for all PLS costs.

Mirrors reference ``src/projected_langevin_sampling/costs/base.py:8-133``.
Costs here are flax.struct pytrees (training labels + scalar likelihood
parameters as leaves, the link function as a static field) so the whole
cost rides through jit/scan. The autograd fallback gradient is one
``jax.grad`` of the summed per-particle cost: since particle j's cost
depends only on column j of the (N, J) prediction samples, the gradient of
the sum IS the per-particle Jacobian the reference assembles with
``torch.vmap(torch.func.jacfwd(...))`` (``costs/base.py:68-84``) — no vmap
needed, and XLA fuses it into the surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class PLSCostMixin:
    """Method mixin shared by the concrete cost structs.

    Subclasses (flax.struct dataclasses) must provide fields
    ``link_function`` (static) and ``y_train``, and may provide
    ``observation_noise``; and must implement ``calculate_cost`` /
    ``calculate_cost_derivative`` / ``predict``.
    """

    # --- to be implemented by subclasses -----------------------------------
    def calculate_cost(self, untransformed_train_prediction_samples: Array) -> Array:
        """Per-particle cost: (N, J) -> (J,)."""
        raise NotImplementedError

    def calculate_cost_derivative(
        self, untransformed_train_prediction_samples: Array, force_autograd: bool = False
    ) -> Array:
        """d cost_j / d F[n, j]: (N, J) -> (N, J)."""
        raise NotImplementedError

    def predict(self, prediction_samples: Array):
        """Build the predictive distribution from (N, J) output-space samples."""
        raise NotImplementedError

    # --- shared implementations --------------------------------------------
    def _calculate_cost_derivative_autograd(
        self, untransformed_train_prediction_samples: Array
    ) -> Array:
        """Autograd fallback (reference ``costs/base.py:68-84``)."""
        return jax.grad(lambda f: jnp.sum(self.calculate_cost(f)))(
            untransformed_train_prediction_samples
        )

    def sample_observation_noise(
        self,
        number_of_particles: int,
        key: KeyArray | int | None = None,
        dtype=None,
    ) -> Array:
        """(J,) observation-noise draws; zeros when the cost has none.

        NOTE: like the reference (``costs/base.py:86-115``), the stored
        ``observation_noise`` is used directly as the normal *std* here even
        though the Gaussian cost treats it as a variance in the NLL — we
        preserve that behaviour for parity.
        """
        noise = getattr(self, "observation_noise", None)
        if dtype is None:
            dtype = self.y_train.dtype
        if noise is None:
            return jnp.zeros((number_of_particles,), dtype=dtype)
        key = as_key(key)
        return jnp.asarray(noise, dtype=dtype) * jax.random.normal(
            key, (number_of_particles,), dtype=dtype
        )

    def predict_samples(
        self,
        untransformed_samples: Array,
        observation_noise: Array | None = None,
        key: KeyArray | int | None = None,
    ) -> Array:
        """link(F + obs_noise) — reference ``costs/base.py:117-133``."""
        if observation_noise is None:
            observation_noise = self.sample_observation_noise(
                number_of_particles=untransformed_samples.shape[1],
                key=key,
                dtype=untransformed_samples.dtype,
            )
        return self.link_function(untransformed_samples + observation_noise[None, :])
