from projected_langevin_sampling_tpu.ops.kernels import (
    ARDKernel,
    PLSKernel,
    ard_gram,
    augment_approximation_samples,
    pls_gram,
    squared_distance,
)
from projected_langevin_sampling_tpu.ops.linalg import (
    cholesky_factor,
    cholesky_solve,
    psd_sqrt,
    robust_cholesky,
    sample_multivariate_normal,
    sample_with_factor,
)

__all__ = [
    "ARDKernel",
    "PLSKernel",
    "ard_gram",
    "augment_approximation_samples",
    "pls_gram",
    "squared_distance",
    "cholesky_factor",
    "cholesky_solve",
    "psd_sqrt",
    "robust_cholesky",
    "sample_multivariate_normal",
    "sample_with_factor",
]
