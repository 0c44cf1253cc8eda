"""PLS facade — the public model object.

Mirrors the reference orchestrator
(``src/projected_langevin_sampling/projected_langevin_sampling.py:7-204``):
a thin delegation layer over a pluggable basis and cost. The facade itself is
a plain mutable Python object for ergonomics (the reference mutates
``observation_noise`` in the experiment harness); all computation happens in
the pure methods of the basis/cost pytrees, so the hot loop in
``training.py`` works directly on ``(pls.basis, pls.cost)`` under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


@jax.jit
def _chunked_untransformed_samples(
    basis: PLSBasisMixin,
    particles: Array,
    x_blocks: Array,
    keys: Array,
    x_aug_sentinel: Array,
) -> Array:
    """All serving chunks in ONE compiled program: vmap over the chunk axis
    batches the per-chunk (M + c)^2 covariance factorisations (batched eigh
    on device) and collapses the per-chunk dispatches — on the TPU tunnel
    the eager per-chunk loop paid ~35 ms dispatch latency PER CHUNK plus a
    serial eigh each. Marginal law per point is identical to the loop (and
    to the unchunked joint); only the PRNG key schedule differs
    (``split(key, B)`` instead of sequential splitting), which the chunked
    path never promised to preserve.

    ``basis`` must arrive with its kernel's approximation samples ALREADY
    augmented with the full test batch (the host-side unique(concat) union
    cannot run under trace); ``x_aug_sentinel`` is the zero-row (0, D) array
    that tells ``PLSKernel.forward`` to skip re-augmentation."""

    def one(x_chunk: Array, key: KeyArray) -> Array:
        return basis.predict_untransformed_samples(
            particles=particles,
            x=x_chunk,
            key=key,
            augmentation_samples=x_aug_sentinel,
        )

    return jax.vmap(one)(x_blocks, keys)  # (B, c, J)


def _sharded_chunked_untransformed_samples(
    mesh,
    basis: PLSBasisMixin,
    particles: Array,
    x_blocks: Array,
    keys: Array,
    x_aug_sentinel: Array,
) -> Array:
    """Chunked serving sharded over the mesh (round-4 stretch): the chunk
    axis is embarrassingly parallel — each device draws its own blocks'
    joint predictives (basis/particles replicated, zero collectives). Same
    per-chunk keys as the single-device vmap, so draws match
    ``_chunked_untransformed_samples`` on the same block padding up to
    compile-vs-eager float reassociation (tests/test_prediction.py)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[-1]  # the particle axis doubles as the serve axis

    def shard_fn(x_b, k_b):
        return _chunked_untransformed_samples(
            basis, particles, x_b, k_b, x_aug_sentinel
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis)),
        out_specs=P(axis, None, None),
    )
    return jax.jit(fn)(x_blocks, keys)


class PLS:
    """Projected Langevin Sampling model.

    N: number of training points; M: approximation dimension;
    J: number of particles; D: input dimension.
    """

    def __init__(self, basis: PLSBasisMixin, cost: PLSCostMixin, name: str | None = None):
        self.basis = basis
        self.cost = cost
        self.name: str = name if name is not None else "pls"

    # --- observation noise proxy (reference :29-33) -------------------------
    @property
    def observation_noise(self):
        return getattr(self.cost, "observation_noise", None)

    @observation_noise.setter
    def observation_noise(self, value):
        self.cost = self.cost.replace(observation_noise=jnp.asarray(value))

    # --- initialisation ------------------------------------------------------
    def initialise_particles(
        self,
        number_of_particles: int,
        noise_only: bool = True,
        key: KeyArray | int | None = None,
        seed: int | None = None,
    ) -> Array:
        if key is None and seed is not None:
            key = seed
        return self.basis.initialise_particles(
            number_of_particles=number_of_particles, noise_only=noise_only, key=key
        )

    def sample_observation_noise(
        self, number_of_particles: int, key: KeyArray | int | None = None
    ) -> Array:
        return self.cost.sample_observation_noise(
            number_of_particles=number_of_particles, key=key
        )

    def sample_predictive_noise(
        self, particles: Array, x: Array, key: KeyArray | int | None = None
    ) -> Array:
        return self.basis.sample_predictive_noise(particles=particles, x=x, key=key)

    # --- training-time quantities -------------------------------------------
    def calculate_cost(self, particles: Array) -> Array:
        """(J,) per-particle cost (reference :72-88)."""
        samples = self.basis.calculate_untransformed_train_prediction_samples(particles)
        return self.cost.calculate_cost(samples)

    def calculate_cost_derivative(self, particles: Array) -> Array:
        """(N, J) cost derivative at the current particles (reference :90-105)."""
        samples = self.basis.calculate_untransformed_train_prediction_samples(particles)
        return self.cost.calculate_cost_derivative(samples)

    def calculate_particle_update(
        self,
        particles: Array,
        step_size: float,
        noise: Array | None = None,
        key: KeyArray | int | None = None,
    ) -> Array:
        """(M, J) Langevin update (reference :107-123). ``noise``/``key``
        control the diffusion term explicitly (JAX has no global PRNG)."""
        cost_derivative = self.calculate_cost_derivative(particles)
        return self.basis.calculate_particle_update(
            particles=particles,
            cost_derivative=cost_derivative,
            step_size=step_size,
            noise=noise,
            key=key,
        )

    def calculate_energy_potential(self, particles: Array) -> float:
        """Scalar mean energy (reference :125-138)."""
        assert particles.shape[0] == self.basis.approximation_dimension, (
            f"Particles have shape {particles.shape} but requires "
            f"({self.basis.approximation_dimension}, J) dimension."
        )
        cost = self.calculate_cost(particles)
        return self.basis.calculate_energy_potential(particles=particles, cost=cost)

    # --- prediction -----------------------------------------------------------
    def predict_samples(
        self,
        particles: Array,
        x: Array,
        predictive_noise: Array | None = None,
        observation_noise: Array | None = None,
        key: KeyArray | int | None = None,
        chunk_size: int | None = None,
        mesh=None,
    ) -> Array:
        """(N*, J) output-space samples (reference :140-163). Noise tensors may
        be injected for deterministic parity testing.

        ``chunk_size``: serving-scale option. The exact joint predictive draw
        factorises an (M + N*)^2 covariance — O((M + N*)^3), unusable for
        large test sets (the reference has the same blowup). Chunking draws
        the joint per block of test points: every point's MARGINAL predictive
        law is unchanged (which is all the metrics/quantile paths consume);
        only the noise correlations BETWEEN points in different chunks are
        dropped. Cost: O(N*/c * (M + c)^3).

        ``mesh``: with ``chunk_size``, shard the chunk axis over the mesh's
        last axis (embarrassingly parallel serving, zero collectives) —
        same draws as the single-device chunked path at the same block count
        (ulp-level compile-vs-eager numerics only).
        """
        key = as_key(key)
        key_pred, key_obs = jax.random.split(key)
        if chunk_size is None or x.shape[0] <= chunk_size or predictive_noise is not None:
            untransformed = self.predict_untransformed_samples(
                particles=particles, x=x, noise=predictive_noise, key=key_pred
            )
        else:
            n, c = x.shape[0], chunk_size
            n_blocks = -(-n // c)
            if mesh is not None:
                # pad the BLOCK count to a multiple of the serve-axis size so
                # every device gets equal work (padded blocks are dropped)
                serve = mesh.shape[mesh.axis_names[-1]]
                n_blocks = -(-n_blocks // serve) * serve
            pad = n_blocks * c - n
            if pad:
                # pad with the last test point: duplicates only make the
                # per-chunk covariance PSD-singular, which the eigenvalue
                # clip in sample_multivariate_normal already handles; padded
                # rows are dropped below
                x_padded = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad, x.shape[1]))], axis=0
                )
            else:
                x_padded = x
            # Augment the kernel's approximation set with the FULL test batch
            # ONCE on the host (the unique(concat) union is identical for
            # every chunk), so every point's marginal law matches the
            # unchunked joint; the zero-row sentinel makes the traced code
            # use the pre-augmented kernel as-is.
            from projected_langevin_sampling_tpu.ops.kernels import (
                augment_approximation_samples,
            )

            basis_aug = self.basis.replace(
                kernel=self.basis.kernel.replace(
                    approximation_samples=augment_approximation_samples(
                        self.basis.kernel.approximation_samples, x
                    )
                )
            )
            chunk_fn = (
                _chunked_untransformed_samples
                if mesh is None
                else functools.partial(_sharded_chunked_untransformed_samples, mesh)
            )
            untransformed = chunk_fn(
                basis_aug,
                particles,
                x_padded.reshape(n_blocks, c, x.shape[1]),
                jax.random.split(key_pred, n_blocks),
                jnp.zeros((0, x.shape[1]), dtype=x.dtype),
            ).reshape(n_blocks * c, particles.shape[1])[:n]
        return self.cost.predict_samples(
            untransformed_samples=untransformed,
            observation_noise=observation_noise,
            key=key_obs,
        )

    def predict_untransformed_samples(
        self,
        particles: Array,
        x: Array,
        noise: Array | None = None,
        key: KeyArray | int | None = None,
    ) -> Array:
        return self.basis.predict_untransformed_samples(
            particles=particles, x=x, noise=noise, key=key
        )

    def predict(
        self,
        x: Array,
        particles: Array,
        predictive_noise: Array | None = None,
        observation_noise: Array | None = None,
        key: KeyArray | int | None = None,
    ):
        prediction_samples = self.predict_samples(
            particles=particles,
            x=x,
            predictive_noise=predictive_noise,
            observation_noise=observation_noise,
            key=key,
        )
        return self.cost.predict(prediction_samples=prediction_samples)

    def __call__(
        self,
        x: Array,
        particles: Array,
        predictive_noise: Array | None = None,
        observation_noise: Array | None = None,
        key: KeyArray | int | None = None,
    ):
        return self.predict(
            x=x,
            particles=particles,
            predictive_noise=predictive_noise,
            observation_noise=observation_noise,
            key=key,
        )
