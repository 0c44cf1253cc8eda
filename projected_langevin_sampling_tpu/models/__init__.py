from projected_langevin_sampling_tpu.models import (
    basis,
    conformalise,
    costs,
    distributions,
    gaussian_process,
    inducing_point_selectors,
    temper,
)
from projected_langevin_sampling_tpu.models.pls import PLS

__all__ = [
    "PLS",
    "basis",
    "conformalise",
    "costs",
    "distributions",
    "gaussian_process",
    "inducing_point_selectors",
    "temper",
]
