from projected_langevin_sampling_tpu.models import basis, costs, distributions
from projected_langevin_sampling_tpu.models.pls import PLS

__all__ = ["PLS", "basis", "costs", "distributions"]
