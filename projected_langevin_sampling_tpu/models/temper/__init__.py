from projected_langevin_sampling_tpu.models.temper.base import TemperBase
from projected_langevin_sampling_tpu.models.temper.gp import TemperGP
from projected_langevin_sampling_tpu.models.temper.pls import TemperPLS
from projected_langevin_sampling_tpu.models.temper.pls_classification import (
    TemperPLSClassification,
)

__all__ = ["TemperBase", "TemperGP", "TemperPLS", "TemperPLSClassification"]
