from projected_langevin_sampling_tpu.ops.pallas.fused_update import (
    dc_fn_for_cost,
    fused_langevin_update,
)

__all__ = ["dc_fn_for_cost", "fused_langevin_update"]
