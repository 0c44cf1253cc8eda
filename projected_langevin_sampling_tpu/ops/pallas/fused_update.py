"""Pallas TPU kernel: fused Langevin particle update for general costs.

One training-step drift for the N-space path is

    U' = U - eta * (D^T dc(P U) + prior(U)) + sqrt(2 eta) * eps

The XLA path materialises F = P U (N, J) and dc(F) in HBM between the two
matmuls (~40 MB round trip at bench scale). This kernel tiles over (J, N):
each (N_t, J_t) tile of F lives only in VMEM — computed on the MXU from a
(N_t, M) P-block and the (M, J_t) U-block, pushed through the cost's
elementwise derivative on the VPU, and contracted straight back into the
(M, J_t) output accumulator. On the last N-tile the prior drift, step size
and pre-generated noise fold in, so one kernel launch produces U'.

The cost-specific elementwise derivative is passed as a traced Python
callable ``dc_fn(f_tile, y_tile) -> dc_tile`` — Pallas inlines it into the
kernel (closed forms for Gaussian/Bernoulli/Poisson/Student-T below; any
differentiable cost works via ``jax.grad`` of its pointwise log-density).

Status: numerically verified against the unfused path (max diff ~5e-7 at
bench scale). After tuning (1024x512 tiles + parallel dimension semantics)
it measures ~1.8 ms/call vs XLA's 1.35 ms at N~5000, M=512, J~1000 on the
available v5e chip — XLA's pipelined matmul schedule still wins there, so
the XLA path remains the default and this kernel is the tuning vehicle for
future rounds (remaining candidates: double-buffered P streaming, manual
DMA overlap; bf16 input blocks are a no-op on this chip — it runs f32 and
bf16 matmuls at the same rate).

Reference behaviour being fused: basis/orthonormal.py:128-159 +
costs/*.py closed-form derivatives + trainers.py:149-161 ``particles += update``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# --- elementwise cost derivatives (f, y) -> dc --------------------------------
def gaussian_identity_dc(observation_noise):
    def dc(f, y):
        return (f - y) / observation_noise

    return dc


def bernoulli_sigmoid_dc(jitter: float = 1e-10):
    def dc(f, y):
        p = jnp.clip(jax.nn.sigmoid(f), jitter, 1.0 - jitter)
        return -y * (1.0 - p) + (1.0 - y) * p

    return dc


def poisson_square_dc():
    def dc(f, y):
        return -2.0 * y / f + 2.0 * f

    return dc


def student_t_identity_dc(degrees_of_freedom: float, scale: float):
    def dc(f, y):
        e = f - y
        return (degrees_of_freedom + 1.0) * e / (
            degrees_of_freedom * scale**2 + jnp.square(e)
        )

    return dc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_update_kernel(
    p_ref,  # (N_t, M) block of the train projection P
    d_ref,  # (N_t, M) block of the data-drift matrix D
    y_ref,  # (N_t, 1) block of the labels
    u_ref,  # (M, J_t) particle block (replicated over n)
    prior_ref,  # (M, 1) diagonal prior precision OR (M, M) prior matrix
    noise_ref,  # (M, J_t) noise block
    out_ref,  # (M, J_t) accumulator -> final particles
    *,
    dc_fn,
    eta: float,
    n_valid: int,
    n_tile: int,
    prior_is_diag: bool,
):
    n = pl.program_id(1)
    num_n = pl.num_programs(1)

    f = jnp.dot(p_ref[:], u_ref[:], preferred_element_type=jnp.float32)  # (N_t, J_t)
    dc = dc_fn(f, y_ref[:])  # broadcasts y (N_t, 1) over J_t
    # mask padded rows of the last N tile (guard against garbage padding)
    row = jax.lax.broadcasted_iota(jnp.int32, dc.shape, 0) + n * n_tile
    dc = jnp.where(row < n_valid, dc, 0.0)
    contrib = jax.lax.dot_general(
        d_ref[:], dc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # D_block^T @ dc -> (M, J_t)

    @pl.when(n == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(n != 0)
    def _():
        out_ref[:] = out_ref[:] + contrib

    @pl.when(n == num_n - 1)
    def _():
        u = u_ref[:]
        if prior_is_diag:
            prior_drift = prior_ref[:] * u  # (M,1) * (M,J_t)
        else:
            prior_drift = jnp.dot(
                prior_ref[:], u, preferred_element_type=jnp.float32
            )
        root2eta = (2.0 * eta) ** 0.5
        out_ref[:] = u - eta * (out_ref[:] + prior_drift) + root2eta * noise_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("dc_fn", "eta", "prior_is_diag", "n_tile", "j_tile", "interpret"),
)
def fused_langevin_update(
    p: Array,  # (N, M) train projection
    d: Array,  # (N, M) data-drift matrix (== p for the ONB basis)
    y: Array,  # (N,)
    u: Array,  # (M, J)
    prior: Array,  # (M,) diag or (M, M)
    noise: Array,  # (M, J)
    dc_fn,
    eta: float,
    prior_is_diag: bool = True,
    n_tile: int = 1024,
    j_tile: int = 512,
    interpret: bool = False,
) -> Array:
    """One fused Langevin update U' (same math as the unfused path)."""
    n, m = p.shape
    j = u.shape[1]
    n_pad = _round_up(n, n_tile)
    j_pad = _round_up(j, j_tile)
    if n_pad != n:
        p = jnp.pad(p, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)))
        y = jnp.pad(y, (0, n_pad - n))
    if j_pad != j:
        u = jnp.pad(u, ((0, 0), (0, j_pad - j)))
        noise = jnp.pad(noise, ((0, 0), (0, j_pad - j)))
    y_col = y[:, None]
    prior_block = prior[:, None] if prior_is_diag else prior
    prior_spec = (
        pl.BlockSpec((m, 1), lambda jb, nb: (0, 0), memory_space=pltpu.VMEM)
        if prior_is_diag
        else pl.BlockSpec((m, m), lambda jb, nb: (0, 0), memory_space=pltpu.VMEM)
    )

    kernel = functools.partial(
        _fused_update_kernel,
        dc_fn=dc_fn,
        eta=eta,
        n_valid=n,
        n_tile=n_tile,
        prior_is_diag=prior_is_diag,
    )
    out = pl.pallas_call(
        kernel,
        grid=(j_pad // j_tile, n_pad // n_tile),
        in_specs=[
            pl.BlockSpec((n_tile, m), lambda jb, nb: (nb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, m), lambda jb, nb: (nb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, 1), lambda jb, nb: (nb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, j_tile), lambda jb, nb: (0, jb), memory_space=pltpu.VMEM),
            prior_spec,
            pl.BlockSpec((m, j_tile), lambda jb, nb: (0, jb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m, j_tile), lambda jb, nb: (0, jb), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, j_pad), jnp.float32),
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    # J tiles are independent; only the N axis accumulates
                    dimension_semantics=("parallel", "arbitrary")
                )
            }
        ),
    )(p, d, y_col, u, prior_block, noise)
    return out[:, :j]


def dc_fn_for_cost(cost):
    """Map a cost struct to its elementwise derivative closure, mirroring the
    closed-form dispatch in the cost classes."""
    from projected_langevin_sampling_tpu.models.costs import (
        BernoulliCost,
        GaussianCost,
        PoissonCost,
        StudentTCost,
    )
    from projected_langevin_sampling_tpu.models.link_functions import (
        IdentityLinkFunction,
        SigmoidLinkFunction,
        SquareLinkFunction,
    )

    if isinstance(cost, GaussianCost) and isinstance(
        cost.link_function, IdentityLinkFunction
    ):
        return gaussian_identity_dc(float(cost.observation_noise))
    if isinstance(cost, BernoulliCost) and isinstance(
        cost.link_function, SigmoidLinkFunction
    ):
        return bernoulli_sigmoid_dc(cost.link_function.jitter)
    if isinstance(cost, PoissonCost) and isinstance(
        cost.link_function, SquareLinkFunction
    ):
        return poisson_square_dc()
    if isinstance(cost, StudentTCost) and isinstance(
        cost.link_function, IdentityLinkFunction
    ):
        return student_t_identity_dc(cost.degrees_of_freedom, cost.scale)
    return None
