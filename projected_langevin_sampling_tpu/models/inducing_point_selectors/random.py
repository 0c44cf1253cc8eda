"""Uniform-random inducing-point selection.
Reference ``src/inducing_point_selectors/random.py:9-18``."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.inducing_point_selectors.base import (
    InducingPointSelector,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel

Array = jax.Array


class RandomInducingPointSelector(InducingPointSelector):
    def compute_induce_data(
        self,
        x: Array,
        m: int,
        kernel: ARDKernel | None = None,
        rng: np.random.Generator | None = None,
        **params,
    ) -> tuple[Array, Array]:
        if rng is None:
            rng = np.random
        x_np = np.asarray(x)
        indices = rng.permutation(x_np.shape[0])[:m]
        return jnp.asarray(x_np[indices, ...]), jnp.asarray(indices)
