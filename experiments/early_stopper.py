"""Re-export: the early stopper lives in the framework utils (it is shared by
the jitted Langevin scan and the eager GP trainers). Reference
``experiments/early_stopper.py:4-24``."""

from projected_langevin_sampling_tpu.utils.early_stopper import EarlyStopper

__all__ = ["EarlyStopper"]
