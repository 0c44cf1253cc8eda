"""Device-mesh helpers for multi-chip PLS.

The reference is strictly single-process/single-device (SURVEY.md §0); the
TPU-native scaling axes are J (particles — embarrassingly parallel) and N
(training data — one psum per step for the basis-projected cost gradient).
The mesh therefore has axes ("data", "particles"): shard the (N, M) train
projection and labels over "data", the (M, J) particle matrix over
"particles"; M stays replicated (the O(M^3) work happened once at build).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PARTICLE_AXIS = "particles"


def make_mesh(
    n_data: int | None = None,
    n_particles: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (data, particles) mesh. Defaults: all devices on the particle
    axis (the psum-free direction)."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None and n_particles is None:
        n_data, n_particles = 1, n_dev
    elif n_data is None:
        n_data = n_dev // n_particles
    elif n_particles is None:
        n_particles = n_dev // n_data
    assert n_data * n_particles == n_dev, (
        f"mesh {n_data}x{n_particles} != {n_dev} devices"
    )
    device_grid = np.asarray(devices).reshape(n_data, n_particles)
    return Mesh(device_grid, (DATA_AXIS, PARTICLE_AXIS))
