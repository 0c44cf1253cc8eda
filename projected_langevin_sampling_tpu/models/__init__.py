from projected_langevin_sampling_tpu.models import (
    basis,
    conformalise,
    costs,
    distributions,
    gaussian_process,
    inducing_point_selectors,
    temper,
)
from projected_langevin_sampling_tpu.models.mean_constant import fit_mean_constant_map
from projected_langevin_sampling_tpu.models.pls import PLS

__all__ = [
    "PLS",
    "fit_mean_constant_map",
    "basis",
    "conformalise",
    "costs",
    "distributions",
    "gaussian_process",
    "inducing_point_selectors",
    "temper",
]
