"""Host-side early stopper for eager (non-scan) training loops.

Semantics identical to reference ``experiments/early_stopper.py:4-24``:
patience is measured in accumulated *simulation time* (step sizes) while the
loss is non-improving; non-finite loss stops immediately. The jitted Langevin
loop in ``training.py`` carries the same logic as scan state.
"""

from __future__ import annotations

import numpy as np


class EarlyStopper:
    def __init__(self, patience: float = 1e-4):
        self.patience = patience
        self.simulation_time = 0.0
        self.min_loss = float("inf")

    def should_stop(self, loss: float, step_size: float) -> bool:
        if not np.isfinite(loss):
            return True
        if loss >= self.min_loss:
            self.simulation_time += step_size
            return self.simulation_time >= self.patience
        self.min_loss = loss
        self.simulation_time = 0.0
        return False
