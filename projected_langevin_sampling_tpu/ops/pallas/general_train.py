"""Pallas TPU kernel: the ENTIRE general-cost Langevin training run in one
launch (ONB basis, any closed-form cost).

The general (N-space) path is what every non-Gaussian cost runs
(Bernoulli / Poisson / Student-T — reference hot loop
``experiments/trainers.py:149-161`` with e.g. the Bernoulli closed-form
gradient ``costs/bernoulli.py:64-77``). Per step it is two large matmuls:

    F  = P @ U                     (N, M_k) x (M_k, J)
    G  = P^T @ dc(F)               (M_k, N) x (N, J)
    U' = U - eta G - eta U/lambda + sqrt(2 eta) eps

XLA's scan does this at ~63% MFU but round-trips F (N, J) and the noise
through HBM every step and re-reads P twice. This kernel keeps EVERYTHING
resident in VMEM for the whole run:

  * P stays in VMEM across all T steps (stored bfloat16 — the same operand
    precision XLA's default f32 matmul uses on this TPU, one bf16 MXU pass);
  * F is never materialised: the N axis is swept in tiles, dc is computed
    on the tile and immediately contracted into the f32 accumulator G;
  * noise comes from the hardware PRNG (Box-Muller, as in
    ``spectral_train.py``);
  * the per-step energy (cost at the UPDATED particles + prior quadratic)
    falls out of the NEXT step's F sweep — matching the production scan's
    carried-prediction trick (training.py ``_step_carry_pred``) — and the
    reference's simulation-time early stopping runs in-kernel.

HBM traffic for the whole run: read P + U0 + y once, write U_final + the
(T,) energy trace once — zero bytes per step. The step-time floor is the
MXU (4 N M_k J flops/step) plus the Box-Muller VPU work.

Supported costs (closed forms identical to the library's):
gaussian-identity, bernoulli-sigmoid (plain and residual-smoothed),
bernoulli-probit, poisson-square, student_t-identity, and the bimodal
mixture (multimodal-identity, via the responsibility-weighted closed-form
gradient — the reference trains it autograd-only, ``multimodal.py:79-91``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from projected_langevin_sampling_tpu.ops.pallas.spectral_train import (
    _standard_normals,
)

Array = jax.Array

COST_KINDS = (
    "gaussian",
    "bernoulli_sigmoid",
    "bernoulli_sigmoid_smoothed",
    "bernoulli_probit",
    "poisson_square",
    "student_t",
    "multimodal_identity",
)
_SIGMOID_JITTER = 1e-10
# 16-node Gauss-Hermite rule baked in as compile-time constants — matches the
# library default of make_smoothed_bernoulli_cost (the cost spec in
# training.py routes other node counts to the XLA path)
_GH16_NODES, _GH16_WEIGHTS = np.polynomial.hermite.hermgauss(16)


def _tile_cost_and_dc(kind: str, f, y, valid, p0, p1, p2, aux):
    """Per-tile cost (N_t, J) and derivative (N_t, J) for the closed-form
    cost families; ``valid`` masks padded rows (zero contribution).

    p0/p1/p2 are the cost's scalar parameters:
      gaussian:    p0 = observation noise (variance-in-NLL quirk preserved)
      bernoulli:   unused
      poisson:     unused
      student_t:   p0 = degrees of freedom, p1 = scale
      multimodal_identity: p0 = observation noise (std), p1 = mode shift,
                   p2 = bernoulli mixture weight w
    ``aux`` is the per-row auxiliary column (N_t, 1):
      bernoulli_sigmoid_smoothed: the residual smoothing std s_i
      (zeros for every other kind)
    """
    if kind == "gaussian":
        err = f - y
        cost = (0.5 / p0) * jnp.square(err)
        dc = err / p0
    elif kind == "bernoulli_sigmoid":
        # dtype-aware jitter floor: in the kernel's f32, 1 - 1e-10 rounds to
        # 1.0 and a saturated sigmoid would give log(0) = -inf (see
        # link_functions._probability_clip — same fix)
        jit = jnp.maximum(
            jnp.asarray(_SIGMOID_JITTER, f.dtype), jnp.finfo(f.dtype).eps
        )
        p = jnp.clip(jax.nn.sigmoid(f), jit, 1.0 - jit)
        cost = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        dc = p - y
    elif kind == "bernoulli_sigmoid_smoothed":
        # residual-smoothed expected log-likelihood
        # (models/costs/smoothed_bernoulli.py): cost = E_z[softplus(f + s z)]
        # - y f, dc = E_z[sigmoid(f + s z)] - y, 16-node Gauss-Hermite with
        # the rule unrolled as compile-time constants (pure VPU work fused
        # into the same tile sweep as the MXU contractions)
        cost = -y * f
        dc = -y
        for n_q, w_q in zip(_GH16_NODES, _GH16_WEIGHTS):
            zq = f + jnp.asarray(np.sqrt(2.0) * n_q, f.dtype) * aux
            wq = jnp.asarray(w_q / np.sqrt(np.pi), f.dtype)
            cost = cost + wq * jax.nn.softplus(zq)
            dc = dc + wq * jax.nn.sigmoid(zq)
    elif kind == "bernoulli_probit":
        # d/df of the CLIPPED cross-entropy: phi(f) (p - y)/(p(1-p)) inside
        # the clip, 0 where the clip saturates (matches jax.grad through
        # jnp.clip — the library's autograd fallback for the probit link)
        jit = jnp.maximum(
            jnp.asarray(_SIGMOID_JITTER, f.dtype), jnp.finfo(f.dtype).eps
        )
        cdf = 0.5 * (1.0 + jax.lax.erf(f * (0.5**0.5)))
        in_range = jnp.logical_and(cdf > jit, cdf < 1.0 - jit)
        p = jnp.clip(cdf, jit, 1.0 - jit)
        pdf = jnp.exp(-0.5 * jnp.square(f)) * (1.0 / jnp.sqrt(2.0 * jnp.pi)).astype(
            f.dtype
        )
        cost = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        dc = jnp.where(in_range, pdf * (p - y) / (p * (1.0 - p)), 0.0)
    elif kind == "poisson_square":
        # guard the padded rows BEFORE log/divide (f == 0 there)
        f_safe = jnp.where(valid, f, 1.0)
        cost = -2.0 * y * jnp.log(jnp.abs(f_safe)) + jnp.square(f_safe)
        dc = -2.0 * y / f_safe + 2.0 * f_safe
    elif kind == "student_t":
        err = f - y
        denom = p0 * (p1 * p1)
        cost = 0.5 * (p0 + 1.0) * jnp.log1p(jnp.square(err) / denom)
        dc = (p0 + 1.0) * err / (denom + jnp.square(err))
    elif kind == "multimodal_identity":
        # bimodal Gaussian mixture, identity link (models/costs/multimodal.py):
        # cost = -logsumexp([log w + ll(err + shift), log(1-w) + ll(err)])
        #      = 0.5 err^2/s^2 + log sqrt(2 pi s^2) - log(1-w) - softplus(b + D)
        # with err = y - f, D = ll1 - ll2 = -(shift*err + shift^2/2)/s^2,
        # b = logit(w); dc/df = -(err + r1*shift)/s^2, r1 = sigmoid(b + D)
        # (the responsibility-weighted two-mode pull).
        sigma2 = p0 * p0
        err = y - f
        b = jnp.log(p2) - jnp.log1p(-p2)
        delta = -(p1 * err + 0.5 * p1 * p1) / sigma2
        log_norm = 0.5 * jnp.log(2.0 * jnp.pi * sigma2)
        cost = (
            0.5 * jnp.square(err) / sigma2
            + log_norm
            - jnp.log1p(-p2)
            - jax.nn.softplus(b + delta)
        )
        dc = -(err + jax.nn.sigmoid(b + delta) * p1) / sigma2
    else:  # pragma: no cover — guarded by COST_KINDS at the wrapper
        raise ValueError(kind)
    zero = jnp.zeros((), dtype=f.dtype)
    return jnp.where(valid, cost, zero), jnp.where(valid, dc, zero)


def _general_train_kernel(
    p_ref,  # (N_pad, M_k) bf16 train projection, VMEM-resident all run
    u_in_ref,  # (M_k, J) f32 initial particles (aliased to u_out)
    y_ref,  # (N_pad, 1) f32 targets (zero in padded rows)
    aux_ref,  # (N_pad, 1) f32 per-row cost auxiliary (smoothing std; zeros otherwise)
    inv_lam_ref,  # (M_k, 1) f32 1/eigenvalues (ONB prior precision)
    dec_ref,  # (M_k, 1) f32 split-scheme decay (unused for Euler)
    ds_ref,  # (M_k, 1) f32 split-scheme data-drift row scale (unused for Euler)
    nscale_ref,  # (M_k, 1) f32 split-scheme noise row std (unused for Euler)
    scalar_ref,  # (1, 9) SMEM: [seed, eta, patience, p0, p1, n_valid, J, f_shift, p2]
    u_out_ref,  # (M_k, J) f32 final particles
    energy_ref,  # (T, 1) f32 energy trace (NaN once stopped)
    g_ref,  # (M_k, J) f32 scratch: drift accumulator
    *,
    num_steps: int,
    tile_n: int,
    cost_kind: str,
    discretisation: str = "euler",
    zero_noise: bool = False,  # test hook: deterministic gradient flow
):
    pltpu.prng_seed(scalar_ref[0, 0].astype(jnp.int32))
    eta = scalar_ref[0, 1]
    patience = scalar_ref[0, 2]
    p0 = scalar_ref[0, 3]
    p1 = scalar_ref[0, 4]
    n_valid = scalar_ref[0, 5].astype(jnp.int32)
    j_count = scalar_ref[0, 6]
    f_shift = scalar_ref[0, 7]  # prior mean constant m0: F = m0 + P @ U
    p2 = scalar_ref[0, 8]
    root2eta = jnp.sqrt(2.0 * eta)
    n_pad, m_k = p_ref.shape
    j = u_in_ref.shape[1]
    n_tiles = n_pad // tile_n

    u_out_ref[:] = u_in_ref[:]
    inv_lam = inv_lam_ref[:]

    def sweep(with_g: bool):
        """One pass over the N tiles at the CURRENT particles: accumulates
        per-particle cost; optionally accumulates the data drift into g_ref."""
        u_b = u_out_ref[:].astype(jnp.bfloat16)
        if with_g:
            g_ref[:] = jnp.zeros_like(g_ref)

        def tile_body(nt, cost_j):
            row0 = nt * tile_n
            p_t = p_ref[pl.ds(row0, tile_n), :]
            f = jax.lax.dot(p_t, u_b, preferred_element_type=jnp.float32) + f_shift
            y_t = y_ref[pl.ds(row0, tile_n), :]
            aux_t = aux_ref[pl.ds(row0, tile_n), :]
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
            valid = rows < n_valid
            cost_t, dc = _tile_cost_and_dc(
                cost_kind, f, y_t, valid, p0, p1, p2, aux_t
            )
            if with_g:
                g_ref[:] += jax.lax.dot_general(
                    p_t,
                    dc.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return cost_j + jnp.sum(cost_t, axis=0)

        return jax.lax.fori_loop(0, n_tiles, tile_body, jnp.zeros((j,), jnp.float32))

    def energy_at_current(cost_j):
        u = u_out_ref[:]
        prior_j = 0.5 * jnp.sum(jnp.square(u) * inv_lam, axis=0)
        return jnp.sum(cost_j + prior_j) / j_count

    def body(t, carry):
        min_loss, sim_time, stopped = carry
        cost_j = sweep(with_g=True)

        # the cost of THIS sweep is the energy of the PREVIOUS update
        # (reference records energy after each update; index t-1)
        energy = jnp.where(stopped, jnp.float32(jnp.nan), energy_at_current(cost_j))

        @pl.when(t > 0)
        def _():
            energy_ref[pl.ds(t - 1, 1), :] = energy.reshape(1, 1)

        # EarlyStopper semantics on the recorded energy (early_stopper.py:15-24)
        finite = jnp.isfinite(energy)
        improved = energy < min_loss
        sim_time_new = jnp.where(improved, 0.0, sim_time + eta)
        should_stop = (t > 0) & ((~finite) | ((~improved) & (sim_time_new >= patience)))
        min_loss = jnp.where(
            stopped | (t == 0), min_loss, jnp.where(improved, energy, min_loss)
        )
        sim_time = jnp.where(stopped | (t == 0), sim_time, sim_time_new)
        stopped = stopped | should_stop

        @pl.when(jnp.logical_not(stopped))
        def _():
            u = u_out_ref[:]
            if discretisation == "euler":
                drift = eta * (g_ref[:] + u * inv_lam)
                if zero_noise:
                    u_out_ref[:] = u - drift
                else:
                    u_out_ref[:] = u - drift + root2eta * _standard_normals(u.shape)
            else:
                # split schemes (exponential / preconditioned): explicit data
                # sub-step, then the EXACT prior+noise OU flow —
                #   U' = dec * (U - eta ds*G) + nscale * eps
                # (row constants precomputed by the wrapper; training.py has
                # the derivations)
                u_half = u - eta * (ds_ref[:] * g_ref[:])
                if zero_noise:
                    u_out_ref[:] = dec_ref[:] * u_half
                else:
                    u_out_ref[:] = dec_ref[:] * u_half + nscale_ref[
                        :
                    ] * _standard_normals(u.shape)

        return min_loss, sim_time, stopped

    min_loss, sim_time, stopped = jax.lax.fori_loop(
        0,
        num_steps,
        body,
        (jnp.float32(jnp.inf), jnp.float32(0.0), jnp.bool_(False)),
    )

    # the final update's energy needs one more cost sweep
    final_cost_j = sweep(with_g=False)
    final_energy = jnp.where(
        stopped, jnp.float32(jnp.nan), energy_at_current(final_cost_j)
    )
    energy_ref[pl.ds(num_steps - 1, 1), :] = final_energy.reshape(1, 1)


def _pick_tile_n(n: int) -> int:
    """MXU-friendly N tile; N is padded UP to a multiple of this (padded rows
    are masked in-kernel), so never fall back to skinny tiles."""
    return min(512, -(-n // 8) * 8)


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "cost_kind", "interpret", "zero_noise", "discretisation"),
)
def general_train_fused(
    p: Array,  # (N, M_k) train projection (any float dtype; stored bf16)
    u0: Array,  # (M_k, J) initial particles
    y: Array,  # (N,) targets
    eigenvalues: Array,  # (M_k,) ONB eigenvalues
    cost_kind: str,
    seed,
    eta,
    patience,
    num_steps: int,
    cost_param0=0.0,
    cost_param1=0.0,
    cost_param2=0.0,
    mean_shift=0.0,
    aux: Array | None = None,  # (N,) per-row cost auxiliary (smoothing std)
    interpret: bool = False,
    zero_noise: bool = False,
    discretisation: str = "euler",
) -> tuple[Array, Array]:
    """Run num_steps general-path training steps fully in VMEM.

    Returns (u_final, energies) with the same semantics as the "off" tier of
    ``_train_pls_scan`` (NaN energies after the early stop). Law-equivalent,
    not path-equivalent (hardware PRNG; bf16 MXU operands — the same operand
    precision as XLA's default f32 matmul on this TPU).

    ``discretisation``: "euler" (reference scheme), or the split schemes
    "exponential" / "preconditioned" — same recurrences as the "off" tier of
    ``_train_pls_scan`` (see training.py for the derivations)."""
    assert cost_kind in COST_KINDS, cost_kind
    assert discretisation in ("euler", "exponential", "preconditioned"), discretisation
    n, m_k = p.shape
    j = u0.shape[1]
    # pad N to a tile multiple; padded rows are masked in-kernel
    tile_n = _pick_tile_n(n)
    n_pad = -(-n // tile_n) * tile_n
    p_pad = jnp.zeros((n_pad, m_k), dtype=jnp.bfloat16).at[:n].set(
        p.astype(jnp.bfloat16)
    )
    y_pad = jnp.zeros((n_pad, 1), dtype=jnp.float32).at[:n, 0].set(
        y.astype(jnp.float32)
    )
    aux_pad = jnp.zeros((n_pad, 1), dtype=jnp.float32)
    if aux is not None:
        aux_pad = aux_pad.at[:n, 0].set(aux.astype(jnp.float32))
    scalars = jnp.stack(
        [
            jnp.asarray(seed, dtype=jnp.float32),
            jnp.asarray(eta, dtype=jnp.float32),
            jnp.asarray(patience, dtype=jnp.float32),
            jnp.asarray(cost_param0, dtype=jnp.float32),
            jnp.asarray(cost_param1, dtype=jnp.float32),
            jnp.asarray(n, dtype=jnp.float32),
            jnp.asarray(j, dtype=jnp.float32),
            jnp.asarray(mean_shift, dtype=jnp.float32),
            jnp.asarray(cost_param2, dtype=jnp.float32),
        ]
    )[None, :]
    lam32 = eigenvalues.astype(jnp.float32)
    inv_lam = (1.0 / lam32)[:, None]
    eta32 = jnp.asarray(eta, dtype=jnp.float32)
    if discretisation == "exponential":
        dec = jnp.exp(-eta32 / lam32)[:, None]
        ds = jnp.ones_like(inv_lam)
        nscale = jnp.sqrt(lam32 * -jnp.expm1(-2.0 * eta32 / lam32))[:, None]
    elif discretisation == "preconditioned":
        dec = jnp.full_like(inv_lam, jnp.exp(-eta32))
        ds = lam32[:, None]
        nscale = jnp.sqrt(lam32 * -jnp.expm1(-2.0 * eta32))[:, None]
    else:  # euler: row constants unused
        dec = jnp.ones_like(inv_lam)
        ds = jnp.ones_like(inv_lam)
        nscale = jnp.zeros_like(inv_lam)
    u_final, energies = pl.pallas_call(
        functools.partial(
            _general_train_kernel,
            num_steps=num_steps,
            tile_n=tile_n,
            cost_kind=cost_kind,
            discretisation=discretisation,
            zero_noise=zero_noise,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_k, j), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((m_k, j), jnp.float32)],
        input_output_aliases={1: 0},
        # raise the default 16 MB scoped-VMEM cap: P (bf16) + U + G + the
        # Box-Muller temporaries exceed it at production scale
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p_pad, u0.astype(jnp.float32), y_pad, aux_pad, inv_lam, dec, ds, nscale, scalars)
    return u_final, energies[:, 0]
