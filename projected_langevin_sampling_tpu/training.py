"""Langevin training loops — jitted lax.scan over particle updates.

The reference's hot loop is a Python ``for`` over epochs
(``experiments/trainers.py:139-162``): update -> apply -> energy ->
early-stop check, with patience measured in accumulated *simulation time*
(``experiments/early_stopper.py:4-24``). Here the whole loop is ONE compiled
``lax.scan``: early stopping is carried as state (a ``stopped`` flag freezes
the particles, preserving the reference's exact stop semantics — stop after
applying the offending step's update, without recording its energy).

``step_size`` and ``patience`` are traced scalars, so the log-spaced
step-size search (``experiments/runners.py:331-446``) reuses a single
compiled program across all candidates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


class TrainResult(NamedTuple):
    particles: Array  # (M, J) final particles
    energies: Array  # (number_of_epochs,) energy potential per step (NaN once stopped)
    recorded: Array  # (number_of_epochs,) bool — True where the reference would append
    steps_run: Array  # scalar int — steps actually executed before stopping


def _step(basis, cost, particles: Array, step_size, key: KeyArray):
    """One Langevin step: derivative at U, update, energy at U + dU."""
    train_pred = basis.calculate_untransformed_train_prediction_samples(particles)
    cost_derivative = cost.calculate_cost_derivative(train_pred)
    noise = basis.sample_update_noise(particles.shape[1], key)
    update = basis._calculate_particle_update(
        particles=particles,
        cost_derivative=cost_derivative,
        step_size=step_size,
        noise=noise,
    )
    new_particles = particles + update
    new_pred = basis.calculate_untransformed_train_prediction_samples(new_particles)
    energy = basis.calculate_energy_potential(
        particles=new_particles, cost=cost.calculate_cost(new_pred)
    )
    return new_particles, energy


@functools.partial(jax.jit, static_argnames=("number_of_epochs",))
def _train_pls_scan(
    basis,
    cost,
    particles: Array,
    key: KeyArray,
    step_size,
    patience,
    number_of_epochs: int,
) -> TrainResult:
    dtype = particles.dtype
    step_size = jnp.asarray(step_size, dtype=dtype)
    patience = jnp.asarray(patience, dtype=dtype)
    keys = jax.random.split(key, number_of_epochs)

    def body(carry, key_t):
        u, min_loss, sim_time, stopped, steps = carry

        u_new, energy = jax.lax.cond(
            stopped,
            lambda: (u, jnp.asarray(jnp.nan, dtype=dtype)),
            lambda: _step(basis, cost, u, step_size, key_t),
        )

        # EarlyStopper.should_stop semantics (reference early_stopper.py:15-24)
        finite = jnp.isfinite(energy)
        improved = energy < min_loss
        sim_time_new = jnp.where(improved, 0.0, sim_time + step_size)
        should_stop = (~finite) | ((~improved) & (sim_time_new >= patience))

        min_loss_out = jnp.where(stopped, min_loss, jnp.where(improved, energy, min_loss))
        sim_time_out = jnp.where(stopped, sim_time, sim_time_new)
        recorded = (~stopped) & (~should_stop)
        stopped_out = stopped | should_stop
        steps_out = steps + jnp.where(stopped, 0, 1)

        return (u_new, min_loss_out, sim_time_out, stopped_out, steps_out), (
            energy,
            recorded,
        )

    init = (
        particles,
        jnp.asarray(jnp.inf, dtype=dtype),
        jnp.asarray(0.0, dtype=dtype),
        jnp.asarray(False),
        jnp.asarray(0, dtype=jnp.int32),
    )
    (final_particles, _, _, _, steps_run), (energies, recorded) = jax.lax.scan(
        body, init, keys
    )
    return TrainResult(final_particles, energies, recorded, steps_run)


def train_pls(
    pls: PLS,
    particles: Array,
    number_of_epochs: int,
    step_size: float,
    early_stopper_patience: float = float("inf"),
    key: KeyArray | int | None = None,
    seed: int | None = None,
) -> tuple[Array, list[float]]:
    """Train PLS particles; returns (particles, energy_potentials) exactly like
    reference ``experiments/trainers.py:139-162``."""
    if key is None and seed is not None:
        key = seed
    result = _train_pls_scan(
        pls.basis,
        pls.cost,
        particles,
        as_key(key),
        step_size,
        early_stopper_patience,
        int(number_of_epochs),
    )
    energies = [
        float(e) for e, r in zip(result.energies.tolist(), result.recorded.tolist()) if r
    ]
    return result.particles, energies


@functools.partial(jax.jit, static_argnames=("n_steps",))
def langevin_steps(
    basis, cost, particles: Array, key: KeyArray, step_size, n_steps: int
) -> Array:
    """Throughput path: n_steps Langevin updates, no energy evaluation, no
    early stopping — one train-prediction matmul chain per step."""
    step_size = jnp.asarray(step_size, dtype=particles.dtype)
    keys = jax.random.split(key, n_steps)

    def body(u, key_t):
        train_pred = basis.calculate_untransformed_train_prediction_samples(u)
        cost_derivative = cost.calculate_cost_derivative(train_pred)
        noise = basis.sample_update_noise(u.shape[1], key_t)
        update = basis._calculate_particle_update(
            particles=u,
            cost_derivative=cost_derivative,
            step_size=step_size,
            noise=noise,
        )
        return u + update, None

    final, _ = jax.lax.scan(body, particles, keys)
    return final
