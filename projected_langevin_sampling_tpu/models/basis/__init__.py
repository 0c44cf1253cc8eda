from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.models.basis.inducing_point import (
    InducingPointBasis,
    build_inducing_point_basis,
)
from projected_langevin_sampling_tpu.models.basis.noise_distributions import (
    NormalPredictiveNoise,
    StudentTPredictiveNoise,
)
from projected_langevin_sampling_tpu.models.basis.orthonormal import (
    OrthonormalBasis,
    build_orthonormal_basis,
)

PLSBasis = PLSBasisMixin  # alias matching the reference's class name

__all__ = [
    "PLSBasis",
    "PLSBasisMixin",
    "InducingPointBasis",
    "OrthonormalBasis",
    "build_inducing_point_basis",
    "build_orthonormal_basis",
    "NormalPredictiveNoise",
    "StudentTPredictiveNoise",
]
