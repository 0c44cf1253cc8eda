"""projected_langevin_sampling_tpu — a TPU-native JAX framework for
Projected Langevin Sampling (PLS).

A ground-up rebuild of the capabilities of
``jswu18/projected-langevin-sampling`` (PyTorch/GPyTorch) designed for
TPU hardware: pure-functional pytree models, jitted ``lax.scan`` Langevin
loops, build-time factorisation of all constant linear algebra, Pallas
kernels for the fused particle update, and ``shard_map`` parallelism over
(particles, data) device meshes.
"""

from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.models.basis import (
    InducingPointBasis,
    OrthonormalBasis,
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    GaussianCost,
    MultiModalCost,
    PoissonCost,
    StudentTCost,
)
from projected_langevin_sampling_tpu.models import link_functions
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import langevin_steps, train_pls

__version__ = "0.1.0"

__all__ = [
    "PLS",
    "ARDKernel",
    "PLSKernel",
    "OrthonormalBasis",
    "InducingPointBasis",
    "build_orthonormal_basis",
    "build_inducing_point_basis",
    "BernoulliCost",
    "GaussianCost",
    "MultiModalCost",
    "PoissonCost",
    "StudentTCost",
    "link_functions",
    "train_pls",
    "langevin_steps",
]
