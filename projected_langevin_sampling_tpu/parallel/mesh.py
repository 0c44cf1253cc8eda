"""Device-mesh helpers for multi-chip PLS.

The reference is strictly single-process/single-device (SURVEY.md §0); the
TPU-native scaling axes are J (particles — embarrassingly parallel) and N
(training data — one psum per step for the basis-projected cost gradient).
The mesh therefore has axes ("data", "particles"): shard the (N, M) train
projection and labels over "data", the (M, J) particle matrix over
"particles"; M stays replicated (the O(M^3) work happened once at build).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PARTICLE_AXIS = "particles"


def initialize_multi_host(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
    simulate_cpu_devices: int | None = None,
) -> tuple[int, int]:
    """Guarded multi-process entry point (SURVEY.md §5.8: ICI-pod via
    ``jax.distributed`` + DCN between pods).

    Call once per process BEFORE any other JAX work; after it returns,
    ``jax.devices()`` is the GLOBAL device list, so ``make_mesh()`` builds a
    pod-wide mesh and the shard_map paths in ``sharded.py`` run unchanged —
    the per-step ``psum`` rides ICI within a pod slice and DCN across the
    process boundary, with identical math to single-process mode (tested by
    ``tests/test_multihost.py`` on a 2-process x 4-device CPU simulation).

    Arguments default from the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``);
    on Cloud TPU pods all of them may be None and JAX auto-detects the
    topology. ``simulate_cpu_devices=K`` pins the process to the CPU backend
    with K virtual devices and gloo cross-process collectives — the
    multi-host CI path for machines without a pod.

    Idempotent: a second call (or a single-process run with no coordinator
    anywhere) is a no-op. Returns ``(process_index, process_count)``.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if simulate_cpu_devices is not None:
        # must happen before the backend is instantiated
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(simulate_cpu_devices))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    if jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()
    if coordinator_address is None and num_processes is None:
        # single-process run (nothing to coordinate) unless we're on a
        # platform where JAX can auto-detect a pod topology; initialize(
        # no-args) raises off-pod, so only attempt it when requested via env
        if os.environ.get("JAX_AUTO_INITIALIZE_DISTRIBUTED") != "1":
            return 0, 1
        jax.distributed.initialize()
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


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
