"""Multi-chip Langevin training via shard_map over a (data, particles) mesh.

New TPU-native capability (the reference has no distributed execution,
SURVEY.md §2 parallelism inventory). Correctness contract: identical math to
the single-device path in ``training.py`` — tested with injected noise on a
virtual CPU mesh.

Sharding layout per step (mesh axes: data = N, particles = J):

    U      (M, J)   P(None, "particles")   — replicated over data
    P, D   (N, M)   P("data", None)
    y      (N,)     P("data")
    F=P@U  (N, J)   fully sharded — the big intermediate never materialises
                    unsharded anywhere
    drift  (M, J)   D_loc^T @ dc_loc, then ONE psum over "data"
    prior/noise     local on the particle shard (M replicated)

The per-step noise is drawn inside the shard from a key folded with the
particle-axis index only, so every data-rank holding the same J-shard sees
identical noise (U stays consistent across the data axis without extra
communication).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from projected_langevin_sampling_tpu.models.basis.inducing_point import (
    InducingPointBasis,
)
from projected_langevin_sampling_tpu.models.basis.orthonormal import OrthonormalBasis
from projected_langevin_sampling_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS

Array = jax.Array


@flax.struct.dataclass
class ShardedPLSOperators:
    """The minimal arrays the hot loop touches, extracted from a basis.

    train_projection  P: F = P @ U                     (N, M)
    data_drift        D: data drift = D^T @ dc(F)      (N, M)
    prior_diag / prior_matrix: prior drift operator    (M,) or (M, M)
    noise_factor: update noise = factor @ z, or None for iid N(0, I)
    prior_energy_*: operator for the per-particle prior energy term
    """

    train_projection: Array
    data_drift: Array
    prior_diag: Array | None
    prior_matrix: Array | None
    noise_factor: Array | None
    energy_matrix: Array | None  # ONB: None (uses prior_diag); IPB: K^{-1}
    energy_scale: float = flax.struct.field(pytree_node=False, default=1.0)
    # prior mean constant m0: F = m0 + P @ U (static; 0.0 == reference parity)
    mean_constant: float = flax.struct.field(pytree_node=False, default=0.0)


def operators_from_basis(basis) -> ShardedPLSOperators:
    if isinstance(basis, OrthonormalBasis):
        return ShardedPLSOperators(
            train_projection=basis.train_projection,
            data_drift=basis.train_projection,
            prior_diag=1.0 / basis.eigenvalues,
            prior_matrix=None,
            noise_factor=None,
            energy_matrix=None,
            energy_scale=0.5,
            mean_constant=basis.mean_constant,
        )
    if isinstance(basis, InducingPointBasis):
        m = basis.approximation_dimension
        return ShardedPLSOperators(
            train_projection=basis.train_projection,
            data_drift=basis.base_gram_induce_train.T,
            prior_diag=None,
            prior_matrix=m * basis.inv_base_gram_induce,
            noise_factor=basis.noise_factor,
            energy_matrix=basis.inv_base_gram_induce,
            energy_scale=0.5 * m,
            mean_constant=basis.mean_constant,
        )
    raise TypeError(f"Unsupported basis type {type(basis)}")


def _prior_drift(ops: ShardedPLSOperators, u: Array) -> Array:
    if ops.prior_diag is not None:
        return u * ops.prior_diag[:, None]
    return ops.prior_matrix @ u


def _prior_energy(ops: ShardedPLSOperators, u: Array) -> Array:
    """Per-particle prior energy (J_local,)."""
    if ops.energy_matrix is not None:
        v = ops.energy_matrix @ u
        return ops.energy_scale * jnp.sum(jnp.square(v), axis=0)
    return ops.energy_scale * jnp.sum(jnp.square(u) * ops.prior_diag[:, None], axis=0)


def _sample_noise(ops: ShardedPLSOperators, key: Array, m: int, j_local: int, dtype) -> Array:
    z = jax.random.normal(key, (m, j_local), dtype=dtype)
    if ops.noise_factor is None:
        return z
    return ops.noise_factor @ z


def _ops_specs(ops: ShardedPLSOperators) -> ShardedPLSOperators:
    """PartitionSpecs matching the operator pytree: N-sized leading axes go on
    the data axis, everything else replicated."""
    return ShardedPLSOperators(
        train_projection=P(DATA_AXIS, None),
        data_drift=P(DATA_AXIS, None),
        prior_diag=None if ops.prior_diag is None else P(None),
        prior_matrix=None if ops.prior_matrix is None else P(None, None),
        noise_factor=None if ops.noise_factor is None else P(None, None),
        energy_matrix=None if ops.energy_matrix is None else P(None, None),
        energy_scale=ops.energy_scale,
        mean_constant=ops.mean_constant,
    )


def _cost_specs(cost, n: int):
    """y_train (and any other N-length leaf) shards over data; scalars replicate."""
    return jax.tree.map(
        lambda leaf: P(DATA_AXIS) if (hasattr(leaf, "ndim") and leaf.ndim == 1 and leaf.shape[0] == n) else P(),
        cost,
    )


from collections import OrderedDict

# bounded LRU: a step-size search sweeping n_steps values would otherwise
# accumulate compiled programs without bound
_COMPILE_CACHE: OrderedDict = OrderedDict()
_COMPILE_CACHE_MAXSIZE = 32


def _get_parallel_langevin(mesh: Mesh, n_steps: int, with_energy: bool, ops, cost):
    """Build (once per mesh/steps/pytree-structure) the jitted shard_map'd scan."""
    n = ops.train_projection.shape[0]
    cache_key = (
        mesh,
        n_steps,
        with_energy,
        str(jax.tree.structure(ops)),
        str(jax.tree.structure(cost)),
        n,
    )
    if cache_key in _COMPILE_CACHE:
        _COMPILE_CACHE.move_to_end(cache_key)
        return _COMPILE_CACHE[cache_key]

    def run(ops, cost, u, base_key, step_size):
        dtype = u.dtype
        m, j_local = u.shape
        eta = jnp.asarray(step_size, dtype=dtype)
        root2eta = jnp.sqrt(2.0 * eta)
        # per-shard key: fold in the particle-axis index ONLY (data ranks with
        # the same J-shard must draw identical noise)
        shard_key = jax.random.fold_in(base_key, jax.lax.axis_index(PARTICLE_AXIS))

        def body(u, step_idx):
            f_local = ops.train_projection @ u + ops.mean_constant  # (N_loc, J_loc)
            dc_local = cost.calculate_cost_derivative(f_local)
            drift_data = jax.lax.psum(ops.data_drift.T @ dc_local, DATA_AXIS)
            noise = _sample_noise(
                ops, jax.random.fold_in(shard_key, step_idx), m, j_local, dtype
            )
            u = u - eta * drift_data - eta * _prior_drift(ops, u) + root2eta * noise
            if with_energy:
                f_new = ops.train_projection @ u + ops.mean_constant
                cost_j = jax.lax.psum(cost.calculate_cost(f_new), DATA_AXIS)
                e_j = cost_j + _prior_energy(ops, u)
                energy = jax.lax.psum(jnp.sum(e_j), PARTICLE_AXIS) / jax.lax.psum(
                    jnp.asarray(j_local, dtype=dtype), PARTICLE_AXIS
                )
                return u, energy
            return u, jnp.zeros((), dtype=dtype)

        final, energies = jax.lax.scan(body, u, jnp.arange(n_steps))
        return final, energies

    in_specs = (
        _ops_specs(ops),
        _cost_specs(cost, n),
        P(None, PARTICLE_AXIS),
        P(),  # key replicated
        P(),
    )
    out_specs = (P(None, PARTICLE_AXIS), P())
    fn = jax.jit(
        jax.shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )
    _COMPILE_CACHE[cache_key] = fn
    while len(_COMPILE_CACHE) > _COMPILE_CACHE_MAXSIZE:
        _COMPILE_CACHE.popitem(last=False)
    return fn


def parallel_langevin_steps(
    mesh: Mesh,
    basis,
    cost,
    particles: Array,
    key: Array,
    step_size,
    n_steps: int,
    with_energy: bool = False,
):
    """Run n_steps of the Langevin update sharded over the mesh.

    Returns (particles, energies) — energies is None unless with_energy.
    NOTE: uses a shard-local PRNG stream (folded keys), so draws differ from
    the single-device ``langevin_steps`` stream; the distribution is
    identical. For exact parity tests, use ``parallel_langevin_steps_with_noise``.
    """
    ops = operators_from_basis(basis)
    runner = _get_parallel_langevin(mesh, int(n_steps), with_energy, ops, cost)
    particles = jax.device_put(
        particles, NamedSharding(mesh, P(None, PARTICLE_AXIS))
    )
    final, energies = runner(ops, cost, particles, key, step_size)
    return final, (energies if with_energy else None)


def parallel_langevin_steps_with_noise(
    mesh: Mesh,
    basis,
    cost,
    particles: Array,
    noise: Array,  # (T, M, J) — the exact noise sequence to inject
    step_size,
):
    """Deterministic variant for multi-device == single-device parity tests."""
    ops = operators_from_basis(basis)

    def run(ops, cost, u, noise, step_size):
        dtype = u.dtype
        eta = jnp.asarray(step_size, dtype=dtype)
        root2eta = jnp.sqrt(2.0 * eta)

        def body(u, noise_t):
            f_local = ops.train_projection @ u + ops.mean_constant
            dc_local = cost.calculate_cost_derivative(f_local)
            drift_data = jax.lax.psum(ops.data_drift.T @ dc_local, DATA_AXIS)
            u = u - eta * drift_data - eta * _prior_drift(ops, u) + root2eta * noise_t
            return u, None

        final, _ = jax.lax.scan(body, u, noise)
        return final

    n = ops.train_projection.shape[0]
    in_specs = (
        _ops_specs(ops),
        _cost_specs(cost, n),
        P(None, PARTICLE_AXIS),
        P(None, None, PARTICLE_AXIS),
        P(),
    )
    fn = jax.shard_map(
        run, mesh=mesh, in_specs=in_specs, out_specs=P(None, PARTICLE_AXIS),
    )
    particles = jax.device_put(particles, NamedSharding(mesh, P(None, PARTICLE_AXIS)))
    return jax.jit(fn)(ops, cost, particles, noise, step_size)
