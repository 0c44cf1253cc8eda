"""Covariance kernels as pure functions over pytree parameter structs.

The reference builds on gpytorch kernel *objects* (``ScaleKernel(RBFKernel)``
plus the wrapping ``PLSKernel`` at ``src/projected_langevin_sampling/kernel.py:5-79``).
Here kernels are immutable ``flax.struct`` dataclasses of parameter arrays and
gram construction is a pure, jittable function built around one matmul — the
MXU-friendly squared-distance expansion ``|a|^2 + |b|^2 - 2 a.b``. Lazy
operators are unnecessary at these sizes (M up to ~1k, N up to ~10k): dense
grams fit comfortably in HBM and let XLA fuse the scale/exp elementwise tail
into the matmul epilogue.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@flax.struct.dataclass
class ARDKernel:
    """Scaled RBF kernel with per-dimension (ARD) lengthscales.

    k(x1, x2) = outputscale * exp(-0.5 * sum_d ((x1_d - x2_d) / lengthscale_d)^2)

    Equivalent to the reference's ``gpytorch.kernels.ScaleKernel(RBFKernel(ard_num_dims=D))``
    used throughout the experiments (e.g. ``experiments/curves/regression/main.py``).
    Parameters are stored as raw positive values; optimisers should work in
    log-space (see ``models/gaussian_process``).
    """

    lengthscales: Array  # (D,)
    outputscale: Array  # scalar

    @property
    def dtype(self):
        return self.lengthscales.dtype

    def __call__(self, x1: Array, x2: Array | None = None, diag: bool = False) -> Array:
        return ard_gram(self, x1, x2, diag=diag)


def _as_2d(x: Array) -> Array:
    return x[:, None] if x.ndim == 1 else x


def squared_distance(x1: Array, x2: Array) -> Array:
    """Pairwise squared Euclidean distances via the matmul expansion.

    Shapes: (N1, D) x (N2, D) -> (N1, N2). Clamped at zero to guard the
    catastrophic-cancellation negatives the expansion can produce.

    The cross term runs at ``Precision.HIGHEST``: the TPU's default fp32
    matmul uses bf16 MXU operands (~1e-3 relative error), which is fine for
    ordinary contractions but catastrophic inside this cancellation — on
    iris_petal the resulting gram error reached 1.6e-2 in d^2 and left
    ``K + sigma^2 I`` indefinite by 0.03 (every factorisation NaN'd). The
    same computation in true fp32 errs by 7e-7. Gram builds are outside
    the Langevin hot loop, so the 3-pass fp32 matmul costs nothing
    end-to-end.
    """
    x1 = _as_2d(x1)
    x2 = _as_2d(x2)
    n1 = jnp.sum(jnp.square(x1), axis=-1)  # (N1,)
    n2 = jnp.sum(jnp.square(x2), axis=-1)  # (N2,)
    cross = jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)  # (N1, N2)
    return jnp.maximum(n1[:, None] + n2[None, :] - 2.0 * cross, 0.0)


def ard_gram(kernel: ARDKernel, x1: Array, x2: Array | None = None, diag: bool = False) -> Array:
    """Dense gram matrix k(x1, x2) for the scaled ARD-RBF kernel.

    Same-input grams (``x2`` omitted or the SAME array object) zero the
    squared-distance diagonal exactly — gpytorch's ``x1_eq_x2`` path does
    the same (``fill_diagonal_(0)``). Without it the matmul expansion's
    fp32 cancellation leaves a spurious positive distance on the diagonal,
    so ``k(x,x)``'s diagonal drops BELOW its exact-duplicate off-diagonals
    (observed on iris_petal: diag 1.1814 vs duplicate-pair 1.1860) and
    ``K + sigma^2 I`` is indefinite by ~5e-3 — far beyond any jitter the
    escalation ladder tries, so LAPACK's NaN is legitimate and every
    downstream solve is poisoned."""
    same = x2 is None or (x2 is x1)
    if x2 is None:
        x2 = x1
    x1 = _as_2d(jnp.asarray(x1))
    x2 = _as_2d(jnp.asarray(x2))
    if diag:
        d2 = jnp.sum(jnp.square((x1 - x2) / kernel.lengthscales), axis=-1)
        return kernel.outputscale * jnp.exp(-0.5 * d2)
    scaled1 = x1 / kernel.lengthscales
    scaled2 = x2 / kernel.lengthscales
    d2 = squared_distance(scaled1, scaled2)
    if same:
        d2 = jnp.fill_diagonal(d2, 0.0, inplace=False)
    return kernel.outputscale * jnp.exp(-0.5 * d2)


@flax.struct.dataclass
class PLSKernel:
    """The projected kernel r of the paper (reference ``kernel.py:5-79``):

    r(x1, x2) = (1/N) * k(x1, Z) @ k(Z, x2)

    where Z = ``approximation_samples`` (the N training inputs) and k is the
    base kernel. ``forward`` with ``additional_approximation_samples`` mirrors
    the reference's OOD-robust augmentation (``kernel.py:40-45``): the sample
    set becomes unique(concat(Z, extra)). Row-deduplication is data-dependent,
    so it happens on the host (numpy) — prediction paths run once per
    experiment and are not inside the hot jitted loop.
    """

    base_kernel: ARDKernel
    approximation_samples: Array  # (N, D)

    def forward(
        self,
        x1: Array,
        x2: Array,
        additional_approximation_samples: Array | None = None,
        diag: bool = False,
    ) -> Array:
        samples = self.approximation_samples
        # A zero-row additional set is the "already augmented" sentinel used
        # by the chunked serving path (pls.py), which performs the host-side
        # unique(concat) union ONCE before tracing; the static shape check
        # keeps this branch jit-safe.
        if (
            additional_approximation_samples is not None
            and additional_approximation_samples.shape[0] > 0
        ):
            samples = augment_approximation_samples(
                samples, additional_approximation_samples
            )
        return pls_gram(self.base_kernel, x1, x2, samples, diag=diag)

    def __call__(self, x1: Array, x2: Array, diag: bool = False) -> Array:
        return self.forward(x1, x2, diag=diag)


def augment_approximation_samples(samples: Array, additional: Array) -> jnp.ndarray:
    """unique(concat(samples, additional), axis=0) on the host.

    Matches ``torch.cat(...).unique(dim=0)`` at reference ``kernel.py:43-45``
    (torch's unique sorts rows, as does np.unique).
    """
    stacked = np.concatenate(
        [np.asarray(_as_2d(samples)), np.asarray(_as_2d(additional))], axis=0
    )
    return jnp.asarray(np.unique(stacked, axis=0))


def pls_gram(
    base_kernel: ARDKernel,
    x1: Array,
    x2: Array,
    approximation_samples: Array,
    diag: bool = False,
) -> Array:
    """r(x1, x2) = (1/S) k(x1, Z_s) k(Z_s, x2) — two grams and one matmul."""
    num_samples = approximation_samples.shape[0]
    gram_1 = ard_gram(base_kernel, x1, approximation_samples)  # (N1, S)
    gram_2 = ard_gram(base_kernel, x2, approximation_samples)  # (N2, S)
    res = (gram_1 @ gram_2.T) / num_samples
    if diag:
        return jnp.diagonal(res)
    return res
