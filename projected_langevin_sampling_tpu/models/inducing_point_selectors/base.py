"""Inducing-point selection — reference ``src/inducing_point_selectors/base.py:8-34``.

Selection runs once per experiment on the host (it is inherently sequential),
so the implementations are numpy; results are returned as JAX arrays.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import numpy as np

from projected_langevin_sampling_tpu.ops.kernels import ARDKernel

Array = jax.Array


class InducingPointSelector(ABC):
    @abstractmethod
    def compute_induce_data(
        self,
        x: Array,
        m: int,
        kernel: ARDKernel,
        rng: np.random.Generator | None = None,
        **params,
    ) -> tuple[Array, Array]:
        """Select m inducing points from x; returns (induce_data, indices)."""
        raise NotImplementedError

    def __call__(
        self,
        x: Array,
        m: int,
        kernel: ARDKernel,
        rng: np.random.Generator | None = None,
        **params,
    ) -> tuple[Array, Array]:
        return self.compute_induce_data(x=x, m=m, kernel=kernel, rng=rng, **params)
