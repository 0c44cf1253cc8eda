from projected_langevin_sampling_tpu.ops.pallas.fused_update import (
    dc_fn_for_cost,
    fused_langevin_update,
)
from projected_langevin_sampling_tpu.ops.pallas.gram import pallas_ard_gram

__all__ = ["dc_fn_for_cost", "fused_langevin_update", "pallas_ard_gram"]
