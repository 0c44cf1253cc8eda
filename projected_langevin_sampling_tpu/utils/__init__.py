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
    "KeyArray",
    "as_key",
    "normal",
    "sample_point",
    "set_seed",
    "split_like",
]
