from projected_langevin_sampling_tpu.parallel.auto import parallel_train_pls
from projected_langevin_sampling_tpu.parallel.mesh import (
    DATA_AXIS,
    PARTICLE_AXIS,
    initialize_multi_host,
    make_mesh,
)
from projected_langevin_sampling_tpu.parallel.sharded import (
    ShardedPLSOperators,
    operators_from_basis,
    parallel_langevin_steps,
    parallel_langevin_steps_with_noise,
)

__all__ = [
    "DATA_AXIS",
    "PARTICLE_AXIS",
    "initialize_multi_host",
    "make_mesh",
    "parallel_train_pls",
    "ShardedPLSOperators",
    "operators_from_basis",
    "parallel_langevin_steps",
    "parallel_langevin_steps_with_noise",
]
