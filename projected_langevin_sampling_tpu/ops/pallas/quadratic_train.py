"""Pallas TPU kernel: the ENTIRE quadratic-tier Langevin run in one launch.

The quadratic tier (Gaussian cost, identity link — ``training.py``
``_quadratic_system``) reduces each step to M-space normal equations:

    U' = U - eta (A U - b) + sqrt(2 eta) S eps
    energy_j = 0.5 U'^T E U' - e_bias . U' + e_const

For the ONB basis A == E and S == I ("shared"), so ONE (M, M) x (M, J)
matmul per step serves both this step's energy and the next step's drift.
For the IPB basis A is non-symmetric in U coordinates and the noise is
correlated (S = psd-sqrt of k(Z,Z)); this kernel runs that case directly.
(IPB+Gaussian ALSO diagonalises after the S^{-1} change of variables —
``training.spectral_fast_path_available`` — so the spectral tiers are
usually the faster choice; this kernel remains the fused path that is
trajectory-comparable to the quadratic XLA tier.)

Everything (A, E, S, U, the carried V = A U) stays VMEM-resident for the
whole run; noise comes from the hardware PRNG; energy + the reference's
simulation-time early stopping run in-kernel (same semantics as
``spectral_train.py``). Zero HBM bytes per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from projected_langevin_sampling_tpu.ops.pallas.spectral_train import (
    _standard_normals,
)

Array = jax.Array


def _quadratic_train_kernel(
    a_ref,  # (M, M) drift matrix A
    e_ref,  # (M, M) energy matrix E (== A when shared)
    s_ref,  # (M, M) noise factor S (== I when iid)
    b_ref,  # (M, 1) drift bias
    e_bias_ref,  # (M, 1) energy bias
    u_in_ref,  # (M, J) initial particles (aliased to u_out)
    scalar_ref,  # (1, 4) SMEM: [seed, eta, patience, e_const]
    u_out_ref,  # (M, J)
    energy_ref,  # (T, 1)
    v_ref,  # (M, J) scratch: E @ U (carried when shared)
    *,
    num_steps: int,
    shared: bool,
    iid_noise: bool,
    zero_noise: bool = False,
):
    pltpu.prng_seed(scalar_ref[0, 0].astype(jnp.int32))
    eta = scalar_ref[0, 1]
    patience = scalar_ref[0, 2]
    e_const = scalar_ref[0, 3]
    root2eta = jnp.sqrt(2.0 * eta)
    j = u_in_ref.shape[1]

    u_out_ref[:] = u_in_ref[:]
    b = b_ref[:]
    e_bias = e_bias_ref[:]
    # V = A @ U at the current particles (shared: reused for drift AND energy)
    v_ref[:] = jax.lax.dot(
        a_ref[:], u_in_ref[:], preferred_element_type=jnp.float32
    )

    def body(t, carry):
        min_loss, sim_time, stopped = carry
        u = u_out_ref[:]
        drift = v_ref[:] - b if shared else (
            jax.lax.dot(a_ref[:], u, preferred_element_type=jnp.float32) - b
        )
        if zero_noise:
            u_new = u - eta * drift
        else:
            eps = _standard_normals(u.shape)
            if not iid_noise:
                eps = jax.lax.dot(s_ref[:], eps, preferred_element_type=jnp.float32)
            u_new = u - eta * drift + root2eta * eps
        mat = a_ref[:] if shared else e_ref[:]
        v_new = jax.lax.dot(mat, u_new, preferred_element_type=jnp.float32)
        energy_j = (
            0.5 * jnp.sum(u_new * v_new, axis=0)
            - jnp.sum(e_bias * u_new, axis=0)
            + e_const
        )
        energy = jnp.sum(energy_j) / j
        energy = jnp.where(stopped, jnp.float32(jnp.nan), energy)

        @pl.when(jnp.logical_not(stopped))
        def _():
            u_out_ref[:] = u_new
            v_ref[:] = v_new

        energy_ref[pl.ds(t, 1), :] = energy.reshape(1, 1)

        # reference EarlyStopper semantics (early_stopper.py:15-24)
        finite = jnp.isfinite(energy)
        improved = energy < min_loss
        sim_time_new = jnp.where(improved, 0.0, sim_time + eta)
        should_stop = (~finite) | ((~improved) & (sim_time_new >= patience))
        min_loss = jnp.where(stopped, min_loss, jnp.where(improved, energy, min_loss))
        sim_time = jnp.where(stopped, sim_time, sim_time_new)
        return min_loss, sim_time, stopped | should_stop

    jax.lax.fori_loop(
        0,
        num_steps,
        body,
        (jnp.float32(jnp.inf), jnp.float32(0.0), jnp.bool_(False)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "shared", "interpret", "zero_noise"),
)
def quadratic_train_fused(
    a: Array,  # (M, M)
    b: Array,  # (M,)
    energy_matrix: Array,  # (M, M)
    energy_bias: Array,  # (M,)
    noise_factor: Array | None,  # (M, M) or None for iid
    u0: Array,  # (M, J)
    seed,
    eta,
    patience,
    energy_const,
    num_steps: int,
    shared: bool,
    interpret: bool = False,
    zero_noise: bool = False,
) -> tuple[Array, Array]:
    """Run num_steps quadratic-tier training steps fully in VMEM.

    Returns (u_final, energies) with the same semantics as the "quadratic"
    tier of ``_train_pls_scan`` (NaN energies after the early stop).
    Law-equivalent, not path-equivalent (hardware PRNG)."""
    m, j = u0.shape
    iid_noise = noise_factor is None
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    scalars = jnp.stack(
        [f32(seed), f32(eta), f32(patience), f32(energy_const)]
    )[None, :]
    s_mat = (
        jnp.eye(m, dtype=jnp.float32) if iid_noise else noise_factor.astype(jnp.float32)
    )
    u_final, energies = pl.pallas_call(
        functools.partial(
            _quadratic_train_kernel,
            num_steps=num_steps,
            shared=shared,
            iid_noise=iid_noise,
            zero_noise=zero_noise,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, j), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((m, j), jnp.float32)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        a.astype(jnp.float32),
        energy_matrix.astype(jnp.float32),
        s_mat,
        b.astype(jnp.float32)[:, None],
        energy_bias.astype(jnp.float32)[:, None],
        u0.astype(jnp.float32),
        scalars,
    )
    return u_final, energies[:, 0]
