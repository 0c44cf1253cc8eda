"""Greedy conditional-variance inducing-point selection.

Reference ``src/inducing_point_selectors/conditional_variance.py:10-120``
(itself adapted from RobustGP): greedy MAP inference for a DPP, equivalent to
a partial pivoted Cholesky of the kernel matrix. O(NM) memory, O(NM^2) time.
Each round picks the point with the largest remaining conditional variance
di = diag(Kff - Qff) given the points chosen so far, then downdates di with
the new pivot column. Random permutation first so ties break randomly;
optional early stop when tr(Kff - Qff) < threshold.

Host-side numpy by design: the loop is sequential and runs once per
experiment; only the pivot-column kernel evaluations are vectorised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.inducing_point_selectors.base import (
    InducingPointSelector,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, ard_gram

Array = jax.Array


class ConditionalVarianceInducingPointSelector(InducingPointSelector):
    def __init__(self, threshold: float | None = 0.0):
        """threshold: stop early once tr(Kff - Qff) < threshold (approximation
        converged)."""
        self.threshold = threshold

    def compute_induce_data(
        self,
        x: Array,
        m: int,
        kernel: ARDKernel,
        rng: np.random.Generator | None = None,
        jitter: float = 1e-12,
    ) -> tuple[Array, Array]:
        assert m > 1, "Must have at least 2 inducing points"
        if rng is None:
            rng = np.random
        x_np = np.asarray(x)
        if x_np.ndim == 1:
            x_np = x_np[:, None]
        n = x_np.shape[0]

        perm = rng.permutation(n)  # random tie-breaking
        xp = x_np[perm]
        xp_j = jnp.asarray(xp)

        # remaining conditional variance of every candidate
        di = np.asarray(ard_gram(kernel, xp_j, xp_j, diag=True), dtype=np.float64) + jitter
        chosen = np.empty(m, dtype=int)
        chosen[0] = int(np.argmax(di))
        # rows of the partial pivoted-Cholesky factor, (m-1, N)
        ci = np.zeros((m - 1, n))
        selected_count = 1
        for i in range(m - 1):
            j = int(chosen[i])
            dj = np.sqrt(di[j])
            cj = ci[:i, j]  # (i,)
            pivot_col = np.asarray(
                ard_gram(kernel, xp_j, xp_j[j : j + 1]), dtype=np.float64
            )[:, 0]  # k(X, x_j), (N,)
            pivot_col = np.round(pivot_col, 20)
            pivot_col[j] += jitter
            ei = (pivot_col - cj @ ci[:i]) / dj
            ci[i, :] = ei
            di = np.clip(di - np.square(ei), 0.0, None)
            # next pivot: largest remaining variance not yet selected
            for candidate in np.argsort(di)[::-1]:
                if int(candidate) not in chosen[: i + 1]:
                    chosen[i + 1] = int(candidate)
                    break
            selected_count = i + 2
            if self.threshold is not None and float(np.sum(di)) < self.threshold:
                print("ConditionalVariance: Terminating selection of inducing points early.")
                break
        chosen = chosen[:selected_count]
        induce_data = xp[chosen]
        original_indices = perm[chosen]
        return jnp.asarray(induce_data), jnp.asarray(original_indices)
