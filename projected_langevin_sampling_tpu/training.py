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
import os
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


# ---------------------------------------------------------------------------
# Quadratic (Gaussian-identity) fast path
# ---------------------------------------------------------------------------
#
# For the Gaussian cost with identity link the cost derivative is affine in
# the train predictions, so the whole data term collapses algebraically:
#
#   data drift  = D^T (P U - y)/s   = (D^T P / s) U - D^T y / s
#   total drift = A U - b,   A = D^T P / s + prior,   b = D^T y / s
#   cost_j      = (U_j^T (P^T P) U_j - 2 (P^T y)^T U_j + y^T y) / (2 s)
#
# (P = train projection, D = data-drift matrix, s = observation noise
# variance; for the ONB basis D == P so the drift matrix A is also the
# energy quadratic + prior and ONE (M,M)@(M,J) matmul per step serves the
# drift of this step AND the energy of the previous one.)
#
# The reference pays three (N,M)x(M,J) matmuls per training step for this
# (orthonormal.py:106-108,151-158 + the energy recomputation); collapsing to
# the M-space normal equations cuts per-step FLOPs by ~2N/M while computing
# the exact same stochastic process (same drift, same noise — only fp
# reassociation differs). Non-quadratic costs keep the general N-space path.


def quadratic_fast_path_available(basis, cost) -> bool:
    from projected_langevin_sampling_tpu.models.costs.gaussian import GaussianCost
    from projected_langevin_sampling_tpu.models.link_functions import (
        IdentityLinkFunction,
    )

    return isinstance(cost, GaussianCost) and isinstance(
        cost.link_function, IdentityLinkFunction
    )


def spectral_fast_path_available(basis, cost) -> bool:
    """The spectral tier additionally requires a basis whose OU process
    diagonalises exactly.

    ONB: the drift matrix is symmetric and the update noise iid — direct.

    IPB: the drift A = P·Kzz⁻¹ (P = KzxKxz/σ² + M·I, symmetric PSD) is
    non-symmetric and the noise is N(0, Kzz) — but the process is exactly a
    PRECONDITIONED Langevin (preconditioner Kzz): the change of variables
    W = S⁻¹U for any factor S with SSᵀ = Kzz gives drift S⁻¹AS = S⁻¹PS⁻ᵀ
    (symmetric PSD), iid noise, and an energy matrix that transforms to the
    SAME matrix (E = Kzz⁻¹PKzz⁻¹ ⇒ SᵀES = S⁻¹PS⁻ᵀ) with e_bias mapping to
    b_w. So in W space IPB+Gaussian is the ONB shared case and the
    elementwise spectral recurrence applies verbatim. S is the eigh PSD
    sqrt — the exact factor the basis's update noise already uses.

    Conditioning assumption (IPB): the similarity transform is exact only
    while k(Z,Z)'s eigenvalues stay above eps*lam_max; below that,
    ``spectral_system_host`` clamps them (and warns) and the spectral law
    can deviate from the quadratic/general tiers beyond fp noise — prefer
    fast_path='quadratic' on such grams."""
    from projected_langevin_sampling_tpu.models.basis.inducing_point import (
        InducingPointBasis,
    )
    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )

    return quadratic_fast_path_available(basis, cost) and isinstance(
        basis, (OrthonormalBasis, InducingPointBasis)
    )


# Tiers implementing each non-Euler discretisation's recurrence. One table,
# consulted by train_pls (resolution), _train_pls_scan (direct-caller guard),
# langevin_steps and parallel_train_pls — keep in sync by construction.
NON_EULER_TIERS = {
    "exponential": ("off", "general_fused"),
    "preconditioned": ("off", "general_fused", "spectral", "spectral_fused"),
}

# The physicists' 16-node Gauss-Hermite rule the fused general kernel bakes in
# (ops/pallas/general_train.py); general_fused_cost_spec refuses to fuse a
# SmoothedBernoulliCost carrying any other rule.
_GH16_NODES, _GH16_WEIGHTS = np.polynomial.hermite.hermgauss(16)


def _is_gh16_rule(cost) -> bool:
    """True when the cost's (gh_nodes, gh_weights) is the physicists'
    hermgauss(16) rule. The factory stamps the STATIC ``gh_rule`` tag, which
    survives tracing — a directly-constructed cost without the tag is
    accepted only when its arrays are concrete and numerically match
    (rtol covers the f32 cast of the f64 constants; atol=0 so the
    2.6e-10-sized weights are compared relatively too). Under jit an
    untagged cost's arrays are tracers and CANNOT be validated — refuse to
    fuse rather than silently train the kernel's baked-in rule."""
    nodes, weights = cost.gh_nodes, cost.gh_weights
    if isinstance(nodes, jax.core.Tracer) or isinstance(weights, jax.core.Tracer):
        # Abstract values cannot be validated; trust only the factory's
        # static stamp. (A ``.replace(gh_nodes=...)`` that swaps the arrays
        # under jit while keeping the stale tag is an explicit foot-gun —
        # concrete arrays below are always checked numerically.)
        return getattr(cost, "gh_rule", "custom") == "hermgauss"
    return bool(
        np.allclose(np.asarray(nodes), _GH16_NODES, rtol=1e-5, atol=0)
        and np.allclose(np.asarray(weights), _GH16_WEIGHTS, rtol=1e-5, atol=0)
    )


def _precond_spectral_coeffs(step_size, sigma, b_rot):
    """Elementwise recurrence coefficients of the preconditioned spectral
    tier: W' = decay*W + shift + noise_scale*eps (see ``_spectral_system``)."""
    exp_decay = jnp.exp(-step_size)
    decay = exp_decay * (1.0 - step_size * sigma)
    shift = exp_decay * step_size * b_rot
    noise_scale = jnp.sqrt(-jnp.expm1(-2.0 * step_size))
    return decay, shift, noise_scale


def general_fused_cost_spec(basis, cost):
    """(cost_kind, param0, param1, param2, aux) for the fused whole-run
    general kernel (``ops/pallas/general_train.py``), or None when the
    (basis, cost, link) combination is outside its closed-form families.
    ``aux`` is the per-row auxiliary column (the residual smoothing std) or
    None."""
    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )
    from projected_langevin_sampling_tpu.models.costs import (
        BernoulliCost,
        GaussianCost,
        MultiModalCost,
        PoissonCost,
        SmoothedBernoulliCost,
        StudentTCost,
    )
    from projected_langevin_sampling_tpu.models.link_functions import (
        IdentityLinkFunction,
        ProbitLinkFunction,
        SigmoidLinkFunction,
        SquareLinkFunction,
    )

    if not isinstance(basis, OrthonormalBasis):
        return None
    link = cost.link_function
    if isinstance(cost, GaussianCost) and isinstance(link, IdentityLinkFunction):
        return ("gaussian", cost.observation_noise, 0.0, 0.0, None)
    if (
        isinstance(cost, BernoulliCost)
        and isinstance(link, SigmoidLinkFunction)
        and link.jitter == 1e-10  # the kernel hard-codes the library default
    ):
        return ("bernoulli_sigmoid", 0.0, 0.0, 0.0, None)
    if (
        isinstance(cost, SmoothedBernoulliCost)
        and isinstance(link, SigmoidLinkFunction)
        # The kernel bakes in the physicists' hermgauss(16) rule; a cost
        # carrying any OTHER 16-point rule (custom nodes/weights built without
        # the factory) must stay on the XLA path or the fused and off tiers
        # would silently train different costs.
        and cost.gh_nodes.shape[0] == 16
        and _is_gh16_rule(cost)
    ):
        return ("bernoulli_sigmoid_smoothed", 0.0, 0.0, 0.0, cost.smoothing_std)
    if (
        isinstance(cost, BernoulliCost)
        and isinstance(link, ProbitLinkFunction)
        and link.jitter == 1e-10
    ):
        return ("bernoulli_probit", 0.0, 0.0, 0.0, None)
    if isinstance(cost, PoissonCost) and isinstance(link, SquareLinkFunction):
        return ("poisson_square", 0.0, 0.0, 0.0, None)
    if isinstance(cost, StudentTCost) and isinstance(link, IdentityLinkFunction):
        return ("student_t", cost.degrees_of_freedom, cost.scale, 0.0, None)
    if isinstance(cost, MultiModalCost) and isinstance(link, IdentityLinkFunction):
        # closed-form responsibility-weighted gradient (the reference trains
        # this cost autograd-only, multimodal.py:79-91 — same math)
        return (
            "multimodal_identity",
            cost.observation_noise,
            cost.shift,
            cost.bernoulli_noise,
            None,
        )
    return None


def resolve_fast_path(basis, cost, fast_path: str, particles_bytes: int | None = None) -> str:
    """Resolve a fast-path request to the tier that will actually run.

    Tiers (all compute the same posterior; see the module comment above):
      "off"       — general N-space path, any cost.
      "quadratic" — collapsed M-space normal equations. Identical TRAJECTORY
                    to "off" given the same keys (fp reassociation only).
      "spectral"  — ONB or IPB + Gaussian: diagonalise the (symmetrised) OU
                    drift once and evolve
                    W = Q^T U with a purely ELEMENTWISE recurrence — zero
                    matmuls per step. Identical LAW (the iid Gaussian noise is
                    rotation-invariant), but not the same sample path for a
                    given key. Energies/posterior moments are distributed
                    identically; early stopping behaves the same.
      "auto"      — spectral if available, else quadratic, else off.
    """
    if fast_path == "auto":
        if spectral_fast_path_available(basis, cost):
            return "spectral"
        if quadratic_fast_path_available(basis, cost):
            return "quadratic"
        return "off"
    if fast_path == "spectral_fused" and particles_bytes is not None:
        # the fused kernel keeps the whole particle matrix in VMEM; fall back
        # to the XLA spectral tier when it cannot fit (~16 MB/core, leave room
        # for noise + temporaries)
        if particles_bytes > 8 * 1024 * 1024:
            return "spectral"
    if fast_path == "general_fused":
        # whole-run kernel keeps P (bf16) + U + drift accumulator + temps in
        # VMEM (it raises the scoped cap to ~100 MB); fall back to the XLA
        # general path when the resident set cannot fit or the cost has no
        # closed form in the kernel
        if general_fused_cost_spec(basis, cost) is None:
            return "off"
        if particles_bytes is not None:
            p_bytes = 2 * basis.train_projection.size  # bf16-resident
            if p_bytes + 4 * particles_bytes > 90 * 1024 * 1024:
                return "off"
        return "general_fused"
    if fast_path in ("spectral", "spectral_fused") and not spectral_fast_path_available(
        basis, cost
    ):
        raise ValueError(
            "spectral fast path requires an ONB or IPB basis + GaussianCost(identity)"
        )
    if fast_path in ("quadratic", "quadratic_fused") and not quadratic_fast_path_available(
        basis, cost
    ):
        raise ValueError("quadratic fast path requires GaussianCost(identity)")
    assert fast_path in (
        "off", "quadratic", "quadratic_fused", "spectral", "spectral_fused"
    ), fast_path
    return fast_path


def resolve_tier(
    basis, cost, fast_path: str, discretisation: str, particles_bytes: int,
    strict: bool = True,
) -> str:
    """Single source of truth for the (fast_path, discretisation) -> tier
    mapping, shared by ``train_pls``, ``langevin_steps`` (``strict=False``)
    and ``parallel.parallel_train_pls`` (the GSPMD path additionally clamps
    fused tiers to their partitionable parents). With ``strict=True`` raises
    on combinations no tier implements; ``strict=False`` downgrades them to
    the general tier instead (for callers that cannot raise usefully, e.g.
    the jitted throughput path)."""
    if discretisation == "euler":
        return resolve_fast_path(
            basis, cost, fast_path, particles_bytes=particles_bytes
        )
    if discretisation not in NON_EULER_TIERS:
        raise ValueError(f"Unknown discretisation {discretisation!r}")
    allowed = NON_EULER_TIERS[discretisation]
    if fast_path == "auto":
        return (
            "spectral"
            if discretisation == "preconditioned"
            and spectral_fast_path_available(basis, cost)
            else "off"
        )
    if fast_path in allowed:
        # general_fused may still fall back to "off" on cost/VMEM limits
        return resolve_fast_path(
            basis, cost, fast_path, particles_bytes=particles_bytes
        )
    if not strict:
        return "off"
    raise ValueError(
        f"fast_path={fast_path!r} does not implement "
        f"discretisation={discretisation!r} (allowed: {allowed} or 'auto')"
    )


def needs_w_space_reroute(basis, fast_path: str, discretisation: str) -> bool:
    """True when an IPB model must run through the exact W-space ONB view
    (``ipb_w_space_view``): the fused general kernel and every non-Euler
    discretisation are ONB-only. Shared by the single-device and parallel
    entry points so the two cannot drift."""
    from projected_langevin_sampling_tpu.models.basis.inducing_point import (
        InducingPointBasis,
    )

    return isinstance(basis, InducingPointBasis) and (
        discretisation != "euler" or fast_path == "general_fused"
    )


def _quadratic_system(basis, cost):
    """Build (A, b, energy_matrix, energy_bias, energy_const, shared) inside
    jit — the N-sized contractions run ONCE per compiled call, not per step."""
    from projected_langevin_sampling_tpu.models.basis.inducing_point import (
        InducingPointBasis,
    )
    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )

    p = basis.train_projection
    # prior mean constant m0 folds into the targets exactly for the
    # identity-link Gaussian cost: c(F + m0, y) == c(F, y - m0), so every
    # downstream drift/energy formula holds verbatim with y_eff = y - m0
    y = cost.y_train - basis.mean_constant if basis.mean_constant else cost.y_train
    s = cost.observation_noise
    pt_p = p.T @ p  # (M, M), one N-contraction per compiled call
    pt_y = p.T @ y

    if isinstance(basis, OrthonormalBasis):
        prior = jnp.diag(1.0 / basis.eigenvalues)
        a = pt_p / s + prior
        b = pt_y / s
        energy_matrix = a  # 0.5 U^T (P^T P / s + Lambda^{-1}) U
        shared = True
    elif isinstance(basis, InducingPointBasis):
        d = basis.base_gram_induce_train.T  # (N, M)
        m = basis.approximation_dimension
        kinv = basis.inv_base_gram_induce
        a = (d.T @ p) / s + m * kinv
        b = (d.T @ y) / s
        energy_matrix = pt_p / s + m * (kinv @ kinv)
        shared = False
    else:
        raise TypeError(f"No quadratic fast path for {type(basis)}")
    energy_bias = pt_y / s
    energy_const = 0.5 * (y @ y) / s
    return a, b, energy_matrix, energy_bias, energy_const, shared


class SpectralSystem(NamedTuple):
    """Diagonalised OU system. V = q_in^T U enters rotated coordinates,
    U = q_out V leaves them. For the ONB basis q_in == q_out == q
    (orthogonal); for IPB the Cholesky change of variables makes them
    q_in = L^{-T} q and q_out = L q (see ``spectral_fast_path_available``)."""

    sigma: Array  # (M,) drift eigenvalues
    q_in: Array  # (M, M): V0 = q_in^T @ U0
    q_out: Array  # (M, M): U = q_out @ V
    b_rot: Array  # (M,) rotated drift/energy bias
    e_const: Array  # scalar energy constant


def _spectral_system(basis, cost, discretisation: str = "euler"):
    """Diagonalise the OU drift; returns a ``SpectralSystem``.

    ``discretisation="euler"`` (the reference's explicit scheme):
    in rotated coordinates V the update is elementwise:
        V' = (1 - eta sigma) V + eta b_rot + sqrt(2 eta) eps,  eps iid
    and the energy is 0.5 sum sigma V^2 - b_rot . V + const. The
    factorisations run once per compiled call.

    ONB: A symmetric, noise iid — eigh(A) directly.
    IPB: W = L^{-1} U (Kzz = L L^T) symmetrises the drift and whitens the
    noise; eigh(L^{-1} A L) then diagonalises. Energy matrix and bias map to
    the same (sigma, b_rot) — the shared elementwise energy formula holds.

    ``discretisation="preconditioned"`` (ONB only; see ``train_pls``): the
    Lambda-preconditioned chain U' = e^{-eta}(U - eta Lambda (A_d U - b))
    + sqrt(lambda(1-e^{-2eta})) eps is diagonalised by the SYMMETRIC
    data-curvature matrix C = Lambda^{1/2} A_d Lambda^{1/2} = Q S Q^T:
    W = Q^T Lambda^{-1/2} U has iid noise (cov (1-e^{-2eta}) I) and the
    elementwise recurrence W' = e^{-eta}((1-eta s) W + eta b_rot) + noise.
    The stored ``sigma`` is the DATA-ONLY spectrum s; the energy quadratic
    in W coordinates is 0.5 sum (s+1) W^2 - b_rot . W + const.

    NOTE: under jit on the TPU eigh runs in reduced device precision
    (~1e-7 reconstruction error even on f64 inputs — a chip quirk). The
    public entry points (``train_pls``, ``langevin_steps``,
    ``parallel_train_pls``) therefore precompute the system EAGERLY via
    ``spectral_system_host`` (host fp64) and pass it in; this in-jit
    path is the fallback for direct ``_train_pls_scan`` callers.
    """
    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )

    if discretisation == "preconditioned":
        if not isinstance(basis, OrthonormalBasis):
            raise ValueError(
                "preconditioned spectral system requires the ONB basis "
                "(route IPB through its W-space ONB view first)"
            )
        p = basis.train_projection
        # y_eff = y - m0 — exact for the identity-link Gaussian cost
        y = cost.y_train - basis.mean_constant if basis.mean_constant else cost.y_train
        s_noise = cost.observation_noise
        lam = basis.eigenvalues
        root_lam = jnp.sqrt(lam)
        # C = Lam^{1/2} (P^T P / s) Lam^{1/2} == (P Lam^{1/2})^T (P Lam^{1/2}) / s
        p_half = p * root_lam[None, :]
        c = (p_half.T @ p_half) / s_noise
        sigma, q = jnp.linalg.eigh(c)
        b = p.T @ y / s_noise
        b_rot = q.T @ (root_lam * b)
        q_in = (1.0 / root_lam)[:, None] * q  # W = q_in^T U
        q_out = root_lam[:, None] * q  # U = q_out W
        e_const = 0.5 * (y @ y) / s_noise
        return SpectralSystem(sigma, q_in, q_out, b_rot, e_const)

    a, b, _, _, e_const, _ = _quadratic_system(basis, cost)
    if isinstance(basis, OrthonormalBasis):
        sigma, q = jnp.linalg.eigh(a)
        b_rot = q.T @ b
        return SpectralSystem(sigma, q, q, b_rot, e_const)
    # IPB: W = S^{-1} U with S = V lam^{1/2} (the eigh PSD sqrt of Kzz — the
    # exact same factor the basis uses for its update noise, so the W-space
    # noise is iid by construction)
    lam, v = jnp.linalg.eigh(basis.base_gram_induce)
    lam = jnp.maximum(lam, jnp.finfo(lam.dtype).eps * lam[-1])
    s = v * jnp.sqrt(lam)[None, :]
    s_inv = (1.0 / jnp.sqrt(lam))[:, None] * v.T
    a_w = s_inv @ a @ s
    a_w = 0.5 * (a_w + a_w.T)  # symmetric in exact arithmetic
    b_w = s_inv @ b
    sigma, q = jnp.linalg.eigh(a_w)
    b_rot = q.T @ b_w
    q_in = s_inv.T @ q  # S^{-T} q : V0 = q_in^T U0
    q_out = s @ q  # U = q_out V
    return SpectralSystem(sigma, q_in, q_out, b_rot, e_const)


def spectral_system_host(basis, cost, discretisation: str = "euler"):
    """Eager (outside-jit) spectral system with the factorisations in HOST
    float64.

    The drift matrix A is constant per (basis, cost) — independent of the
    step size — so the factorisation is hoisted out of the compiled program
    entirely, mirroring the basis-build eigh (basis/orthonormal.py). This
    sidesteps the TPU's reduced-precision device eigh: the N-sized
    contraction runs on-device once, the (M, M) matrix moves to host, numpy
    factorises it in fp64, and the factors come back in the working dtype.
    Must be called OUTSIDE jit.

    ``discretisation="preconditioned"``: the Lambda-preconditioned system
    (ONB only) — see ``_spectral_system``."""
    import numpy as np

    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )

    if discretisation == "preconditioned":
        if not isinstance(basis, OrthonormalBasis):
            raise ValueError(
                "preconditioned spectral system requires the ONB basis "
                "(route IPB through its W-space ONB view first)"
            )
        dtype = basis.train_projection.dtype
        p64 = np.asarray(jax.device_get(basis.train_projection), dtype=np.float64)
        y64 = (
            np.asarray(jax.device_get(cost.y_train), dtype=np.float64)
            - basis.mean_constant  # y_eff: exact for identity-link Gaussian
        )
        s_noise = float(jax.device_get(cost.observation_noise))
        lam64 = np.asarray(jax.device_get(basis.eigenvalues), dtype=np.float64)
        root_lam = np.sqrt(lam64)
        p_half = p64 * root_lam[None, :]
        c = (p_half.T @ p_half) / s_noise
        sigma64, q64 = np.linalg.eigh(c)
        b64 = p64.T @ y64 / s_noise
        b_rot64 = q64.T @ (root_lam * b64)
        q_in64 = (1.0 / root_lam)[:, None] * q64
        q_out64 = root_lam[:, None] * q64
        e_const64 = 0.5 * (y64 @ y64) / s_noise
        return SpectralSystem(
            jnp.asarray(sigma64, dtype=dtype),
            jnp.asarray(q_in64, dtype=dtype),
            jnp.asarray(q_out64, dtype=dtype),
            jnp.asarray(b_rot64, dtype=dtype),
            jnp.asarray(e_const64, dtype=dtype),
        )

    a, b, _, _, e_const, _ = _quadratic_system(basis, cost)
    dtype = a.dtype
    a64 = np.asarray(jax.device_get(a), dtype=np.float64)
    b64 = np.asarray(jax.device_get(b), dtype=np.float64)
    if isinstance(basis, OrthonormalBasis):
        sigma64, q64 = np.linalg.eigh(a64)
        q_in64 = q_out64 = q64
        b_rot64 = q64.T @ b64
    else:
        kzz64 = np.asarray(jax.device_get(basis.base_gram_induce), dtype=np.float64)
        lam, v = np.linalg.eigh(kzz64)
        clamped = int(np.sum(lam < np.finfo(np.float64).eps * lam[-1]))
        lam = np.maximum(lam, np.finfo(np.float64).eps * lam[-1])
        s64 = v * np.sqrt(lam)[None, :]
        s_inv64 = (1.0 / np.sqrt(lam))[:, None] * v.T
        a_w = s_inv64 @ a64 @ s64
        a_w = 0.5 * (a_w + a_w.T)
        b_w = s_inv64 @ b64
        sigma64, q64 = np.linalg.eigh(a_w)
        b_rot64 = q64.T @ b_w
        q_in64 = s_inv64.T @ q64
        q_out64 = s64 @ q64
        if clamped:
            import warnings

            warnings.warn(
                "IPB spectral tier: k(Z,Z) eigenvalues were clamped "
                f"({clamped} below eps*lam_max) — the W-space system is no "
                "longer an exact similarity transform of the drift built from "
                "the Cholesky inverse; the spectral law can deviate from the "
                "quadratic/general tiers beyond fp noise on this "
                "ill-conditioned gram. Consider fast_path='quadratic'.",
                stacklevel=2,
            )
    return SpectralSystem(
        jnp.asarray(sigma64, dtype=dtype),
        jnp.asarray(q_in64, dtype=dtype),
        jnp.asarray(q_out64, dtype=dtype),
        jnp.asarray(b_rot64, dtype=dtype),
        jnp.asarray(e_const, dtype=dtype),
    )


def ipb_w_space_view(basis):
    """ONB-shaped view of the IPB training process, with entry/exit maps.

    The reference's IPB process (``inducing_point.py:117-150``) is the
    Kzz-PRECONDITIONED Langevin of E(U) = cost(P U) + (M/2)||Kzz^{-1}U||^2.
    The change of variables W = S^{-1} U with the eigh PSD sqrt
    S = V diag(sqrt(M lam_hat)) (eigh((1/M)Kzz) = (lam_hat, V) — the exact
    factor the basis's update noise uses) maps it to the STANDARD Langevin of
    an ONB-shaped potential:

        pred   = P_w W,  P_w = k(X,Z) V / sqrt(M lam_hat)
        prior  = 0.5 sum_i W_i^2 / lam_hat_i      (diagonal, == ONB energy)
        noise  = iid N(0, I)                       (S^{-1} N(0, Kzz) = iid)
        E_w(W) = E(S W)  — energies are IDENTICAL, so early stopping matches.

    The Euler chains correspond EXACTLY: U_t = S W_t for the same iid draws
    (the IPB update noise is S z with the same z). This view therefore
    extends every ONB-only training path — the fused general kernel and the
    exponential / preconditioned discretisations — to the IPB basis.

    Returns ``(onb_view, s, s_inv)`` with W0 = s_inv @ U0 and U = s @ W.
    Factorisations in host fp64 (the TPU device eigh is reduced-precision).
    """
    import numpy as np

    from projected_langevin_sampling_tpu.models.basis.orthonormal import (
        OrthonormalBasis,
    )

    dtype = basis.base_gram_induce.dtype
    kzz64 = np.asarray(jax.device_get(basis.base_gram_induce), dtype=np.float64)
    m = kzz64.shape[0]
    lam_hat, v = np.linalg.eigh(kzz64 / m)
    lam_hat = np.maximum(lam_hat, np.finfo(np.float64).eps * lam_hat[-1])
    root = np.sqrt(m * lam_hat)
    scaled_eigenvectors = v / root[None, :]  # == reference scaling with M_k = M
    kzx64 = np.asarray(jax.device_get(basis.base_gram_induce_train), dtype=np.float64)
    train_projection = kzx64.T @ scaled_eigenvectors
    s = v * root[None, :]
    s_inv = (1.0 / root)[:, None] * v.T
    view = OrthonormalBasis(
        kernel=basis.kernel,
        x_induce=basis.x_induce,
        eigenvalues=jnp.asarray(lam_hat, dtype=dtype),
        scaled_eigenvectors=jnp.asarray(scaled_eigenvectors, dtype=dtype),
        base_gram_induce_train=basis.base_gram_induce_train,
        train_projection=jnp.asarray(train_projection, dtype=dtype),
        additional_predictive_noise_distribution=None,
        scaling="reference",
        mean_constant=basis.mean_constant,
    )
    return view, jnp.asarray(s, dtype=dtype), jnp.asarray(s_inv, dtype=dtype)


def _replay_early_stopper(energies: Array, step_size, patience):
    """Re-derive (recorded, steps_run) from an energy trace by replaying the
    reference's EarlyStopper on it (the fused kernel freezes the particles
    in-kernel and writes NaN energies after the stop).

    Vectorised (no sequential scan): a step improves iff its energy beats the
    running minimum; the accumulated simulation time at step t is
    step_size * (t - index of the last improvement at or before t); the stop
    is the first step that is non-finite or whose accumulated time reaches
    the patience. Entries after the true stop are NaN (written by the
    kernel), which cannot create an earlier stop."""
    dtype = energies.dtype
    t = energies.shape[0]
    step_size = jnp.asarray(step_size, dtype=dtype)
    patience = jnp.asarray(patience, dtype=dtype)

    finite = jnp.isfinite(energies)
    safe = jnp.where(finite, energies, jnp.inf)
    cummin_excl = jnp.concatenate(
        [jnp.asarray([jnp.inf], dtype=dtype), jax.lax.cummin(safe)[:-1]]
    )
    improved = energies < cummin_excl
    idx = jnp.arange(t)
    last_improved = jax.lax.cummax(jnp.where(improved, idx, -1))
    sim_time = step_size * (idx - last_improved).astype(dtype)
    stop_here = (~finite) | ((~improved) & (sim_time >= patience))
    any_stop = jnp.any(stop_here)
    stop_idx = jnp.where(any_stop, jnp.argmax(stop_here), t)
    recorded = idx < stop_idx
    steps_run = jnp.minimum(stop_idx + 1, t).astype(jnp.int32)
    return recorded, steps_run


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


def _step_carry_pred(basis, cost, particles: Array, train_pred: Array, step_size, key):
    """General-path step that CARRIES the train predictions F = P @ U across
    steps: the F computed for this step's energy is next step's derivative
    input — 2 big matmuls per training step instead of the reference's 3
    (same math; the reference recomputes F twice per step,
    orthonormal.py:106-108 + the energy path)."""
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
    return new_particles, new_pred, energy


@functools.partial(
    jax.jit, static_argnames=("number_of_epochs", "fast_path", "discretisation")
)
def _train_pls_scan(
    basis,
    cost,
    particles: Array,
    key: KeyArray,
    step_size,
    patience,
    number_of_epochs: int,
    fast_path: str = "auto",
    spectral_system=None,
    discretisation: str = "euler",
    stopper_init=None,
) -> TrainResult:
    """``stopper_init``: optional (min_loss, sim_time, stopped) carry for the
    chunked driver (``train_pls`` splits very long runs into bounded device
    programs — a single 1e7-step scan can outlive the TPU tunnel's patience);
    only the XLA-scan tiers support it."""
    dtype = particles.dtype
    step_size = jnp.asarray(step_size, dtype=dtype)
    patience = jnp.asarray(patience, dtype=dtype)
    keys = jax.random.split(key, number_of_epochs)
    root2eta = jnp.sqrt(2.0 * step_size)
    tier = resolve_fast_path(
        basis, cost, fast_path, particles_bytes=particles.dtype.itemsize * particles.size
    )
    if discretisation not in ("euler", "exponential", "preconditioned"):
        raise ValueError(f"Unknown discretisation {discretisation!r}")
    if discretisation != "euler":
        # tiers implementing each non-Euler recurrence (direct-caller guard;
        # ``train_pls`` resolves to a valid tier before calling here)
        allowed = NON_EULER_TIERS[discretisation]
        if tier not in allowed:
            raise ValueError(
                f"discretisation={discretisation!r} is not implemented for the "
                f"{tier!r} tier (allowed: {allowed})"
            )
    if stopper_init is not None and tier.endswith("_fused"):
        raise ValueError(
            "stopper_init (chunked driver) is only supported on the XLA-scan "
            f"tiers, not {tier!r} (the fused kernels run whole-trajectory)"
        )
    spectral = lambda: (
        spectral_system
        if spectral_system is not None
        else _spectral_system(basis, cost, discretisation)
    )

    if tier == "spectral_fused":
        # whole run in one Pallas launch (TPU only, opt-in): particles live in
        # VMEM across all steps, hardware PRNG, in-kernel early stopping
        from projected_langevin_sampling_tpu.ops.pallas.spectral_train import (
            spectral_train_fused,
        )

        sigma, q_in, q_out, b_rot, e_const = spectral()
        if discretisation == "preconditioned":
            decay, shift, noise_scale = _precond_spectral_coeffs(
                step_size, sigma, b_rot
            )
            energy_sigma = sigma + 1.0
        else:
            decay = 1.0 - step_size * sigma
            shift = step_size * b_rot
            noise_scale = jnp.sqrt(2.0 * step_size)
            energy_sigma = sigma
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        w_final, energies = spectral_train_fused(
            (q_in.T @ particles),
            decay,
            shift,
            energy_sigma,
            b_rot,
            seed=seed,
            eta=step_size,
            patience=patience,
            energy_const=e_const,
            num_steps=number_of_epochs,
            noise_scale=noise_scale,
        )
        energies = energies.astype(dtype)
        recorded, steps_run = _replay_early_stopper(energies, step_size, patience)
        return TrainResult(
            (q_out @ w_final.astype(dtype)), energies, recorded, steps_run
        )

    if tier == "general_fused":
        # whole-run general-cost kernel (TPU only, opt-in): P resident in
        # VMEM, F never materialised, hardware PRNG, in-kernel early stopping
        from projected_langevin_sampling_tpu.ops.pallas.general_train import (
            general_train_fused,
        )

        kind, p0, p1, p2, aux = general_fused_cost_spec(basis, cost)
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        u_final, energies = general_train_fused(
            basis.train_projection,
            particles,
            cost.y_train,
            basis.eigenvalues,
            kind,
            seed=seed,
            eta=step_size,
            patience=patience,
            num_steps=number_of_epochs,
            cost_param0=p0,
            cost_param1=p1,
            cost_param2=p2,
            mean_shift=basis.mean_constant,
            aux=aux,
            discretisation=discretisation,
        )
        energies = energies.astype(dtype)
        recorded, steps_run = _replay_early_stopper(energies, step_size, patience)
        return TrainResult(u_final.astype(dtype), energies, recorded, steps_run)

    if tier == "quadratic_fused":
        # whole-run quadratic kernel (TPU only, opt-in); IPB+Gaussian can
        # also use the spectral tiers via the Cholesky change of variables
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )
        from projected_langevin_sampling_tpu.ops.pallas.quadratic_train import (
            quadratic_train_fused,
        )

        a_mat, b_vec, e_mat, e_bias, e_const, shared = _quadratic_system(basis, cost)
        noise_factor = None if isinstance(basis, OrthonormalBasis) else basis.noise_factor
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        u_final, energies = quadratic_train_fused(
            a_mat, b_vec, e_mat, e_bias, noise_factor, particles,
            seed=seed, eta=step_size, patience=patience,
            energy_const=e_const, num_steps=number_of_epochs, shared=shared,
        )
        energies = energies.astype(dtype)
        recorded, steps_run = _replay_early_stopper(energies, step_size, patience)
        return TrainResult(u_final.astype(dtype), energies, recorded, steps_run)

    if tier == "spectral":
        sigma, q_in, q_out, b_rot, e_const = spectral()
        if discretisation == "preconditioned":
            decay, shift, noise_scale = _precond_spectral_coeffs(
                step_size, sigma, b_rot
            )
            energy_sigma = sigma + 1.0
        else:
            decay = 1.0 - step_size * sigma  # (M,)
            shift = step_size * b_rot  # (M,)
            noise_scale = root2eta
            energy_sigma = sigma

        def spectral_step(w, key_t):
            noise = jax.random.normal(key_t, w.shape, dtype=dtype)
            w_new = decay[:, None] * w + shift[:, None] + noise_scale * noise
            energy_j = (
                0.5 * jnp.sum(energy_sigma[:, None] * jnp.square(w_new), axis=0)
                - b_rot @ w_new
                + e_const
            )
            return w_new, jnp.mean(energy_j)

        step_fn, carry0, finish = (
            spectral_step,
            q_in.T @ particles,
            lambda w: q_out @ w,
        )
    elif tier == "quadratic":
        a_mat, b_vec, e_mat, e_bias, e_const, shared = _quadratic_system(basis, cost)

        def quadratic_step(carry, key_t):
            """v carries A @ u (shared case) so one matmul per step covers the
            drift at u and the energy at u'."""
            u, v = carry
            drift = (v if shared else a_mat @ u) - b_vec[:, None]
            noise = basis.sample_update_noise(u.shape[1], key_t)
            u_new = u - step_size * drift + root2eta * noise
            v_new = (a_mat if shared else e_mat) @ u_new
            energy_j = (
                0.5 * jnp.sum(u_new * v_new, axis=0) - e_bias @ u_new + e_const
            )
            return (u_new, v_new), jnp.mean(energy_j)

        step_fn = quadratic_step
        carry0 = (particles, a_mat @ particles if shared else jnp.zeros_like(particles))
        finish = lambda c: c[0]
    elif discretisation == "exponential":
        # OU-splitting / exponential-Euler (opt-in, ONB only): the prior
        # drift -U/lambda is linear and diagonal, so its sub-step (with the
        # matching share of the noise) is integrated EXACTLY:
        #     U -> d*(U - eta B^T dc) + sqrt(lambda (1 - d^2)) eps,
        #     d = exp(-eta/lambda).
        # Unconditionally stable in the prior part — removes the 2*lambda_min
        # explicit-Euler step bound that stiff spectra (e.g. the nystrom
        # scaling's 1/lambda columns under non-Gaussian costs) impose.
        # Same continuous-time process; O(eta) discretisation bias like
        # Euler, but no stiffness constraint from the prior.
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )

        if not isinstance(basis, OrthonormalBasis):
            raise ValueError(
                "discretisation='exponential' requires the ONB basis "
                "(diagonal prior precision, iid update noise; route IPB "
                "through training.ipb_w_space_view)"
            )
        lam = basis.eigenvalues.astype(dtype)
        exp_decay = jnp.exp(-step_size / lam)[:, None]
        # -expm1(-x) == 1 - exp(-x) without the cancellation when eta << lam
        exp_noise = jnp.sqrt(lam * -jnp.expm1(-2.0 * step_size / lam))[:, None]

        def general_step(carry, key_t):
            u, pred = carry
            dc = cost.calculate_cost_derivative(pred)
            eps = jax.random.normal(key_t, u.shape, dtype=dtype)
            u_new = (
                exp_decay * (u - step_size * (basis.train_projection.T @ dc))
                + exp_noise * eps
            )
            pred_new = basis.calculate_untransformed_train_prediction_samples(u_new)
            energy = basis.calculate_energy_potential(
                u_new, cost.calculate_cost(pred_new)
            )
            return (u_new, pred_new), energy

        pred0 = basis.calculate_untransformed_train_prediction_samples(particles)
        step_fn, carry0, finish = general_step, (particles, pred0), lambda c: c[0]
    elif discretisation == "preconditioned":
        # Lambda-preconditioned (Riemannian) Langevin with exact OU prior
        # sub-step (opt-in, ONB only — IPB routes through its W-space view):
        #     dU = -Lambda grad E dt + sqrt(2 Lambda) dW
        # has the SAME stationary density exp(-E) for any constant SPD
        # preconditioner. Splitting: explicit data sub-step
        #     U -> U - eta Lambda B^T dc(B U)
        # then the prior+noise flow dU = -U dt + sqrt(2 Lambda) dW EXACTLY:
        #     U -> e^{-eta} U + sqrt(lambda (1 - e^{-2 eta})) eps.
        # Prior stiffness becomes 1 (unconditional); the data sub-step's
        # curvature is Lambda^{1/2} B^T H B Lambda^{1/2} — under the nystrom
        # scaling B Lambda^{1/2} == the REFERENCE-scaled projection (up to
        # sqrt(M_k/M)), so the reference protocol's step grid is stable
        # again. This is the stable data-term discretisation that makes the
        # nystrom scaling usable for non-Gaussian costs (DESIGN.md §4).
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )

        if not isinstance(basis, OrthonormalBasis):
            raise ValueError(
                "discretisation='preconditioned' requires the ONB basis "
                "(route IPB through training.ipb_w_space_view)"
            )
        lam = basis.eigenvalues.astype(dtype)[:, None]
        exp_decay = jnp.exp(-step_size)
        pre_noise = jnp.sqrt(lam * -jnp.expm1(-2.0 * step_size))

        def general_step(carry, key_t):
            u, pred = carry
            dc = cost.calculate_cost_derivative(pred)
            eps = jax.random.normal(key_t, u.shape, dtype=dtype)
            u_new = (
                exp_decay * (u - step_size * (lam * (basis.train_projection.T @ dc)))
                + pre_noise * eps
            )
            pred_new = basis.calculate_untransformed_train_prediction_samples(u_new)
            energy = basis.calculate_energy_potential(
                u_new, cost.calculate_cost(pred_new)
            )
            return (u_new, pred_new), energy

        pred0 = basis.calculate_untransformed_train_prediction_samples(particles)
        step_fn, carry0, finish = general_step, (particles, pred0), lambda c: c[0]
    else:

        def general_step(carry, key_t):
            u, pred = carry
            u_new, pred_new, energy = _step_carry_pred(
                basis, cost, u, pred, step_size, key_t
            )
            return (u_new, pred_new), energy

        pred0 = basis.calculate_untransformed_train_prediction_samples(particles)
        step_fn, carry0, finish = general_step, (particles, pred0), lambda c: c[0]

    def body(carry, key_t):
        state, min_loss, sim_time, stopped, steps = carry

        state_new, energy = jax.lax.cond(
            stopped,
            lambda: (state, jnp.asarray(jnp.nan, dtype=dtype)),
            lambda: step_fn(state, key_t),
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

        return (state_new, min_loss_out, sim_time_out, stopped_out, steps_out), (
            energy,
            recorded,
        )

    if stopper_init is None:
        min_loss0 = jnp.asarray(jnp.inf, dtype=dtype)
        sim_time0 = jnp.asarray(0.0, dtype=dtype)
        stopped0 = jnp.asarray(False)
    else:
        min_loss0, sim_time0, stopped0 = (
            jnp.asarray(stopper_init[0], dtype=dtype),
            jnp.asarray(stopper_init[1], dtype=dtype),
            jnp.asarray(stopper_init[2], dtype=bool),
        )
    init = (
        carry0,
        min_loss0,
        sim_time0,
        stopped0,
        jnp.asarray(0, dtype=jnp.int32),
    )
    (final_state, _, _, _, steps_run), (energies, recorded) = jax.lax.scan(
        body, init, keys
    )
    return TrainResult(finish(final_state), energies, recorded, steps_run)


# One device program per at most this many Langevin steps: a single 1e7-step
# scan is a multi-minute XLA program that the flaky TPU tunnel can kill
# ("TPU worker process crashed"), and the in-scan early stop still has to
# ITERATE the remaining steps after it fires. Chunking bounds the program
# length and lets the host stop launching chunks once the stopper has fired
# — often a large real-time win at the reference protocol's smallest step
# sizes. Law-preserving but not key-path-identical to the unchunked scan
# (chunk keys are fold_in(key, chunk_index)); runs with
# number_of_epochs <= the chunk size are byte-identical to before.
_SCAN_CHUNK_STEPS = int(os.environ.get("PLST_SCAN_CHUNK_STEPS", "500000"))


def _train_pls_chunked(
    basis,
    cost,
    particles: Array,
    key: KeyArray,
    step_size: float,
    patience: float,
    number_of_epochs: int,
    tier: str,
    spectral_system,
    discretisation: str,
    chunk: int,
) -> TrainResult:
    """Host-side driver: run the jitted scan in bounded chunks, carrying the
    early-stopper state (min_loss, sim_time, stopped) across chunk
    boundaries, and stop launching chunks once the stopper has fired."""
    import numpy as np

    dtype = particles.dtype
    energies_parts: list = []
    recorded_parts: list = []
    u = particles
    min_loss, sim_time, stopped = float("inf"), 0.0, False
    total_steps = 0
    done = 0
    idx = 0
    eta = float(step_size)
    while done < number_of_epochs and not stopped:
        n = int(min(chunk, number_of_epochs - done))
        res = _train_pls_scan(
            basis,
            cost,
            u,
            jax.random.fold_in(key, idx),
            step_size,
            patience,
            n,
            tier,
            spectral_system,
            discretisation,
            stopper_init=(
                jnp.asarray(min_loss, dtype=dtype),
                jnp.asarray(sim_time, dtype=dtype),
                jnp.asarray(stopped),
            ),
        )
        u = res.particles
        e = np.asarray(res.energies, dtype=np.float64)
        r = np.asarray(res.recorded)
        energies_parts.append(np.asarray(res.energies))
        recorded_parts.append(r)
        total_steps += int(res.steps_run)
        done += n
        idx += 1
        # replay the stopper transition over this chunk (vectorised):
        # stopped iff the last step was not recorded
        stopped = not bool(r[-1])
        if not stopped:
            # prefix running-min INCLUDING the incoming min_loss, shifted so
            # prefix[t] is the min BEFORE step t — improvement iff e < prefix
            prefix = np.minimum.accumulate(np.concatenate(([min_loss], e)))[:-1]
            improved = e < prefix
            if improved.any():
                last_improved = int(np.flatnonzero(improved)[-1])
                sim_time = (len(e) - 1 - last_improved) * eta
            else:
                sim_time = sim_time + len(e) * eta
            min_loss = min(min_loss, float(e.min()))
    energies = jnp.asarray(np.concatenate(energies_parts), dtype=dtype)
    recorded = jnp.asarray(np.concatenate(recorded_parts))
    return TrainResult(
        u, energies, recorded, jnp.asarray(total_steps, dtype=jnp.int32)
    )


def train_pls(
    pls: PLS,
    particles: Array,
    number_of_epochs: int,
    step_size: float,
    early_stopper_patience: float = float("inf"),
    key: KeyArray | int | None = None,
    seed: int | None = None,
    fast_path: str = "auto",
    discretisation: str = "euler",
) -> tuple[Array, list[float]]:
    """Train PLS particles; returns (particles, energy_potentials) exactly like
    reference ``experiments/trainers.py:139-162``. ``fast_path`` selects the
    algebraic specialisation tier (see ``resolve_fast_path``).

    ``discretisation``:
      "euler"          — the reference's explicit scheme (default). All tiers.
      "exponential"    — OU-splitting that integrates the prior drift + its
                         noise share exactly, removing the 2*lambda_min prior
                         stability bound. Tiers: off, general_fused.
      "preconditioned" — Lambda-preconditioned Langevin (same stationary
                         posterior; constant-metric Riemannian Langevin) with
                         the exact OU prior sub-step: prior stiffness -> 1 AND
                         the data-term curvature is damped by Lambda^{1/2} on
                         each side — the stable discretisation for the
                         nystrom ONB scaling under non-Gaussian costs
                         (DESIGN.md §4). Tiers: off, general_fused, spectral,
                         spectral_fused (Gaussian-identity costs stay
                         elementwise-fast).
    Both non-Euler schemes are ONB-native; an IPB model is routed through its
    exact W-space ONB view (``ipb_w_space_view`` — identical energies, exact
    Euler-trajectory correspondence U = S W)."""
    from projected_langevin_sampling_tpu.models.basis.inducing_point import (
        InducingPointBasis,
    )

    if key is None and seed is not None:
        key = seed
    if discretisation not in ("euler", "exponential", "preconditioned"):
        raise ValueError(f"Unknown discretisation {discretisation!r}")

    basis, cost = pls.basis, pls.cost
    exit_map = None
    if needs_w_space_reroute(basis, fast_path, discretisation):
        # the W-space ONB view extends the ONB-only paths (fused general
        # kernel, non-Euler discretisations) to IPB — exact Euler-trajectory
        # correspondence U = S W, identical energies
        view, s_mat, s_inv = ipb_w_space_view(basis)
        basis = view
        particles = s_inv @ particles
        exit_map = lambda u: s_mat @ u

    tier = resolve_tier(
        basis,
        cost,
        fast_path,
        discretisation,
        particles_bytes=particles.dtype.itemsize * particles.size,
    )
    if fast_path == "auto" and key is not None and tier in (
        "spectral",
        "spectral_fused",
    ):
        # PARITY.md deviation 3: the spectral tier is law-equivalent but not
        # sample-path-equivalent, so a caller who passed an explicit key/seed
        # is NOT getting a trajectory reproducible against fast_path="off".
        # warnings' per-location dedup makes this fire once per process.
        warnings.warn(
            'fast_path="auto" resolved to the spectral tier: identical '
            "posterior law, but a given key yields a different sample path "
            'than fast_path="quadratic"/"off". Pass fast_path="quadratic" '
            '(or "off") explicitly if you need seeded trajectory '
            "reproducibility.",
            UserWarning,
            stacklevel=2,
        )
    # the spectral factorisation is hoisted out of jit so the eigh runs in
    # host fp64 (the TPU's device eigh is reduced-precision)
    spectral_system = (
        spectral_system_host(basis, cost, discretisation)
        if tier in ("spectral", "spectral_fused")
        else None
    )
    if tier in ("off", "quadratic", "spectral") and (
        int(number_of_epochs) > _SCAN_CHUNK_STEPS
    ):
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
    out_particles = result.particles if exit_map is None else exit_map(result.particles)
    energies = [
        float(e) for e, r in zip(result.energies.tolist(), result.recorded.tolist()) if r
    ]
    return out_particles, energies


@functools.partial(jax.jit, static_argnames=("n_steps", "fast_path", "discretisation"))
def langevin_steps(
    basis,
    cost,
    particles: Array,
    key: KeyArray,
    step_size,
    n_steps: int,
    fast_path: str = "auto",
    spectral_system=None,
    discretisation: str = "euler",
) -> Array:
    """Throughput path: n_steps Langevin updates, no energy evaluation, no
    early stopping. Fast-path tiers as in ``resolve_fast_path``;
    ``discretisation`` as in ``train_pls`` (ONB-native — pass an IPB model's
    ``ipb_w_space_view`` for non-Euler schemes; this function is jitted so
    the host-side view construction cannot happen here)."""
    dtype = particles.dtype
    step_size = jnp.asarray(step_size, dtype=dtype)
    keys = jax.random.split(key, n_steps)
    root2eta = jnp.sqrt(2.0 * step_size)
    tier = resolve_tier(
        basis,
        cost,
        fast_path,
        discretisation,
        particles_bytes=particles.dtype.itemsize * particles.size,
        strict=False,  # jitted throughput path: downgrade instead of raising
    )
    if discretisation != "euler":
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )

        if not isinstance(basis, OrthonormalBasis):
            # the non-Euler spectral systems are ONB-native; an IPB basis
            # falls to the general branch below, whose error names the
            # ipb_w_space_view rerouting
            tier = "off"
    spectral = lambda: (
        spectral_system
        if spectral_system is not None
        else _spectral_system(basis, cost, discretisation)
    )

    if tier == "spectral_fused":
        from projected_langevin_sampling_tpu.ops.pallas.spectral_train import (
            spectral_train_fused,
        )

        sigma, q_in, q_out, b_rot, e_const = spectral()
        if discretisation == "preconditioned":
            decay, shift, noise_scale = _precond_spectral_coeffs(
                step_size, sigma, b_rot
            )
        else:
            decay = 1.0 - step_size * sigma
            shift = step_size * b_rot
            noise_scale = jnp.sqrt(2.0 * step_size)
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        w_final, _ = spectral_train_fused(
            q_in.T @ particles,
            decay,
            shift,
            sigma,
            b_rot,
            seed=seed,
            eta=step_size,
            patience=jnp.inf,
            energy_const=e_const,
            num_steps=n_steps,
            noise_scale=noise_scale,
        )
        return q_out @ w_final.astype(dtype)

    if tier == "general_fused":
        from projected_langevin_sampling_tpu.ops.pallas.general_train import (
            general_train_fused,
        )

        kind, p0, p1, p2, aux = general_fused_cost_spec(basis, cost)
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        u_final, _ = general_train_fused(
            basis.train_projection,
            particles,
            cost.y_train,
            basis.eigenvalues,
            kind,
            seed=seed,
            eta=step_size,
            patience=jnp.inf,
            num_steps=n_steps,
            cost_param0=p0,
            cost_param1=p1,
            cost_param2=p2,
            mean_shift=basis.mean_constant,
            aux=aux,
            discretisation=discretisation,
        )
        return u_final.astype(dtype)

    if tier == "spectral":
        sigma, q_in, q_out, b_rot, _ = spectral()
        if discretisation == "preconditioned":
            decay, shift, noise_scale = _precond_spectral_coeffs(
                step_size, sigma, b_rot
            )
        else:
            decay = 1.0 - step_size * sigma
            shift = step_size * b_rot
            noise_scale = root2eta

        def spectral_body(w, key_t):
            noise = jax.random.normal(key_t, w.shape, dtype=dtype)
            return decay[:, None] * w + shift[:, None] + noise_scale * noise, None

        final_w, _ = jax.lax.scan(spectral_body, q_in.T @ particles, keys)
        return q_out @ final_w

    if tier == "quadratic_fused":
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )
        from projected_langevin_sampling_tpu.ops.pallas.quadratic_train import (
            quadratic_train_fused,
        )

        a_mat, b_vec, e_mat, e_bias, e_const, shared = _quadratic_system(basis, cost)
        noise_factor = None if isinstance(basis, OrthonormalBasis) else basis.noise_factor
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        u_final, _ = quadratic_train_fused(
            a_mat, b_vec, e_mat, e_bias, noise_factor, particles,
            seed=seed, eta=step_size, patience=jnp.inf,
            energy_const=e_const, num_steps=n_steps, shared=shared,
        )
        return u_final.astype(dtype)

    if tier == "quadratic":
        a_mat, b_vec, _, _, _, _ = _quadratic_system(basis, cost)

        def fast_body(u, key_t):
            noise = basis.sample_update_noise(u.shape[1], key_t)
            drift = a_mat @ u - b_vec[:, None]
            return u - step_size * drift + root2eta * noise, None

        final, _ = jax.lax.scan(fast_body, particles, keys)
        return final

    if discretisation != "euler":
        from projected_langevin_sampling_tpu.models.basis.orthonormal import (
            OrthonormalBasis,
        )

        if not isinstance(basis, OrthonormalBasis):
            raise ValueError(
                f"discretisation={discretisation!r} requires the ONB basis "
                "(pass training.ipb_w_space_view for IPB)"
            )
        lam = basis.eigenvalues.astype(dtype)[:, None]
        if discretisation == "exponential":
            dec = jnp.exp(-step_size / lam)
            nscale = jnp.sqrt(lam * -jnp.expm1(-2.0 * step_size / lam))
            dscale = jnp.ones_like(lam)
        else:  # preconditioned
            dec = jnp.full_like(lam, jnp.exp(-step_size))
            nscale = jnp.sqrt(lam * -jnp.expm1(-2.0 * step_size))
            dscale = lam

        def split_body(u, key_t):
            pred = basis.calculate_untransformed_train_prediction_samples(u)
            dc = cost.calculate_cost_derivative(pred)
            eps = jax.random.normal(key_t, u.shape, dtype=dtype)
            u_new = (
                dec * (u - step_size * (dscale * (basis.train_projection.T @ dc)))
                + nscale * eps
            )
            return u_new, None

        final, _ = jax.lax.scan(split_body, particles, keys)
        return final

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
