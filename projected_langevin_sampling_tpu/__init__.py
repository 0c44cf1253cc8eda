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
from projected_langevin_sampling_tpu.models.conformalise import (
    ConformaliseGP,
    ConformalisePLS,
)
from projected_langevin_sampling_tpu.models.gaussian_process import (
    SVGP,
    BernoulliLikelihood,
    ExactGP,
    GaussianLikelihood,
    StudentTLikelihood,
    init_svgp,
)
from projected_langevin_sampling_tpu.models.gaussian_process.training import (
    fit_exact_gp,
    fit_svgp,
)
from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
    RandomInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.temper import TemperGP, TemperPLS
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
    "ExactGP",
    "SVGP",
    "init_svgp",
    "fit_exact_gp",
    "fit_svgp",
    "GaussianLikelihood",
    "BernoulliLikelihood",
    "StudentTLikelihood",
    "TemperGP",
    "TemperPLS",
    "ConformaliseGP",
    "ConformalisePLS",
    "ConditionalVarianceInducingPointSelector",
    "RandomInducingPointSelector",
]
