from projected_langevin_sampling_tpu.utils.backend import (
    backend_initialises,
    ensure_live_backend,
)
from projected_langevin_sampling_tpu.utils.early_stopper import EarlyStopper
from projected_langevin_sampling_tpu.utils.prng import (
    KeyArray,
    as_key,
    normal,
    sample_point,
    set_seed,
    split_like,
)

__all__ = [
    "EarlyStopper",
    "backend_initialises",
    "ensure_live_backend",
    "KeyArray",
    "as_key",
    "normal",
    "sample_point",
    "set_seed",
    "split_like",
]
