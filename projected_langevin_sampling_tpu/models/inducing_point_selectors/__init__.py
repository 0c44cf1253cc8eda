from projected_langevin_sampling_tpu.models.inducing_point_selectors.base import (
    InducingPointSelector,
)
from projected_langevin_sampling_tpu.models.inducing_point_selectors.conditional_variance import (
    ConditionalVarianceInducingPointSelector,
)
from projected_langevin_sampling_tpu.models.inducing_point_selectors.random import (
    RandomInducingPointSelector,
)

__all__ = [
    "InducingPointSelector",
    "ConditionalVarianceInducingPointSelector",
    "RandomInducingPointSelector",
]
