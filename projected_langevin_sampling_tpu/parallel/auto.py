"""GSPMD-auto multi-chip training: run the SAME `_train_pls_scan` program
with the particle matrix sharded over the mesh and let XLA partition.

Complements the explicit shard_map path in ``sharded.py``:

  * this path reuses every fast-path tier (spectral/quadratic/general) —
    the spectral tier in particular is purely elementwise per step, so the
    partitioned program has ZERO per-step communication on the particle axis;
  * noise draws are identical to the single-device program (threefry is a
    pointwise function of (key, position)), so results match single-device
    bit-for-bit up to reduction order.

Basis/cost operands stay replicated (M is small); shard over "data" too if
N-sized arrays dominate HBM — the general path's matmuls then psum once per
step, which GSPMD inserts automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from projected_langevin_sampling_tpu.parallel.mesh import PARTICLE_AXIS
from projected_langevin_sampling_tpu.training import (
    TrainResult,
    _train_pls_scan,
    spectral_system_host,
)
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


def parallel_train_pls(
    mesh: Mesh,
    pls_or_basis,
    cost=None,
    particles: Array | None = None,
    number_of_epochs: int = 1,
    step_size: float = 1e-3,
    early_stopper_patience: float = float("inf"),
    key: KeyArray | int | None = None,
    fast_path: str = "auto",
    discretisation: str = "euler",
) -> TrainResult:
    """Sharded-train: particles distributed over the mesh's particle axis,
    everything else replicated; same semantics as ``training.train_pls``
    (including the IPB -> W-space ONB rerouting for the non-Euler
    discretisations, and the chunked driver for long runs)."""
    from projected_langevin_sampling_tpu.training import (
        NON_EULER_TIERS,
        ipb_w_space_view,
        needs_w_space_reroute,
        resolve_tier,
    )

    if discretisation != "euler" and discretisation not in NON_EULER_TIERS:
        # same explanatory error as train_pls — and before
        # needs_w_space_reroute, which would otherwise treat the unknown
        # value as non-Euler and spuriously reroute an IPB basis
        raise ValueError(f"Unknown discretisation {discretisation!r}")
    if cost is None:  # called with a PLS facade
        basis, cost = pls_or_basis.basis, pls_or_basis.cost
    else:
        basis = pls_or_basis
    exit_map = None
    # Same rerouting + tier resolution as train_pls (shared helpers in
    # training.py), so the two entry points cannot drift.
    if needs_w_space_reroute(basis, fast_path, discretisation):
        view, s_mat, s_inv = ipb_w_space_view(basis)
        basis = view
        particles = s_inv @ particles
        exit_map = lambda u: s_mat @ u
    particle_sharding = NamedSharding(mesh, P(None, PARTICLE_AXIS))
    replicated = NamedSharding(mesh, P())
    particles = jax.device_put(particles, particle_sharding)
    basis = jax.device_put(basis, replicated)
    cost = jax.device_put(cost, replicated)
    tier = resolve_tier(
        basis,
        cost,
        fast_path,
        discretisation,
        particles_bytes=particles.dtype.itemsize * particles.size,
    )
    # The whole-run fused Pallas trainers are opaque custom calls that XLA's
    # SPMD partitioner cannot shard (side-effecting custom-call HLO); the
    # unfused parent tier computes the same stochastic process and partitions
    # cleanly. Fused multi-chip execution belongs to the explicit shard_map
    # path (sharded.py), where partitioning is manual.
    tier = {
        "general_fused": "off",
        "spectral_fused": "spectral",
        "quadratic_fused": "quadratic",
    }.get(tier, tier)
    spectral_system = (
        jax.device_put(spectral_system_host(basis, cost, discretisation), replicated)
        if tier in ("spectral", "spectral_fused")
        else None
    )
    from projected_langevin_sampling_tpu.training import (
        _SCAN_CHUNK_STEPS,
        _train_pls_chunked,
    )

    if tier in ("off", "quadratic", "spectral") and (
        int(number_of_epochs) > _SCAN_CHUNK_STEPS
    ):
        # same bounded-device-program driver as train_pls — the protocol's
        # 1e7-step candidates would otherwise run as one monolithic program
        result = _train_pls_chunked(
            basis,
            cost,
            particles,
            as_key(key),
            step_size,
            early_stopper_patience,
            int(number_of_epochs),
            tier,
            spectral_system,
            discretisation,
            _SCAN_CHUNK_STEPS,
        )
    else:
        result = _train_pls_scan(
            basis,
            cost,
            particles,
            as_key(key),
            step_size,
            early_stopper_patience,
            int(number_of_epochs),
            tier,
            spectral_system,
            discretisation,
        )
    if exit_map is not None:
        result = result._replace(particles=exit_map(result.particles))
    return result
