"""Empirical-Bayes fit of the PLS prior-mean constant.

The reference PLS prior is zero-mean (``orthonormal.py:110-126``), while its
SVGP baseline gets a gpytorch ``ConstantMean()`` whose constant is trained by
the ELBO optimiser together with the variational parameters
(``/root/reference/experiments/uci/classification/main.py:275``,
``/root/reference/experiments/trainers.py:79-101`` — the mean's raw constant is
never removed from the parameter set). That single trained scalar lets the
SVGP latent mean leave the span of the basis functions, which on
near-separable classification datasets is worth ~0.1 nats of test NLL — a gap
no amount of Langevin sampling can close because the PLS function class simply
cannot express a constant offset.

The principled PLS analogue implemented here: treat the prior mean constant
``m0`` as a hyperparameter and point-estimate it by maximising the penalised
posterior jointly over ``[m0; u]`` (empirical Bayes at the MAP, the same
"optimise the hyperparameter, infer the rest" split SVGP applies to its mean):

    (m0*, u*) = argmin  cost(link(m0 + B u)) + 0.5 u^T Lambda^{-1} u

``m0`` itself is unpenalised (a flat hyperprior). Langevin sampling then runs
with the basis prior mean shifted by ``m0*`` — the dynamics and the stationary
law are otherwise unchanged.

The optimisation is a damped Newton method with backtracking line search over
``M_k + 1`` variables (M_k <= a few hundred), run once per model build — cost
is negligible next to a single Langevin step-size candidate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.basis.base import PLSBasisMixin
from projected_langevin_sampling_tpu.models.costs.base import PLSCostMixin


def fit_mean_constant_map(
    basis: PLSBasisMixin,
    cost: PLSCostMixin,
    *,
    newton_iterations: int = 60,
    damping: float = 1e-8,
    gradient_tolerance: float = 1e-6,
    initial_constant: float = 0.0,
) -> float:
    """MAP-optimal prior mean constant for ``basis``/``cost``.

    Works for any basis (the prediction map is linear in the particles, so the
    constant is added outside ``calculate_untransformed_train_prediction_samples``)
    and any cost whose ``calculate_cost`` is a sum of per-data-point terms
    (every library cost is — the analytic Hessian below relies on the
    f-Hessian being diagonal). For convex costs (Gaussian, Bernoulli,
    Poisson) the damped Newton iteration with backtracking line search
    converges globally; for non-convex ones (Student-T tails, MultiModal)
    the result is a local optimum — when the Newton direction is not a
    descent direction (indefinite Hessian) the iteration falls back to the
    scaled gradient, so it still makes monotone progress toward a
    stationary point.

    Returns the fitted constant as a Python float. The caller is expected to
    rebuild/replace the basis with ``mean_constant=m0`` before training.

    Raises ``ValueError`` if the objective is non-finite at the zero start —
    that means the cost/label configuration itself is invalid, which should
    fail loudly rather than silently fit m0=0.
    """
    if basis.mean_constant != 0.0:
        basis = basis.replace(mean_constant=0.0)
    m_k = basis.approximation_dimension
    dtype = basis.dtype

    def predict(u):  # linear in u (mean_constant forced to 0 above)
        return basis.calculate_untransformed_train_prediction_samples(u[:, None])[:, 0]

    def data_sum(f):
        return jnp.sum(cost.calculate_cost(f[:, None]))

    def prior_only(u):
        # basis energy with cost=0 isolates the prior term (mean over the
        # single particle is the value itself); exactly quadratic in u
        return basis.calculate_energy_potential(
            particles=u[:, None], cost=jnp.zeros((1,), dtype=u.dtype)
        )

    def objective(w):
        m0, u = w[0], w[1:]
        return data_sum(predict(u) + m0) + prior_only(u)

    value_and_grad = jax.jit(jax.value_and_grad(objective))

    # Analytic Hessian: f(w) = b_aug @ w exactly (predict is linear, zero
    # offset), the costs' f-Hessian is diagonal (per-point sums), and the
    # prior is quadratic — so
    #   H(w) = b_aug^T diag(c''(f)) b_aug + blockdiag(0, P).
    # This replaces jax.hessian's M_k+1 forward tangents through the full
    # N-point (and quadrature-node) cost per Newton iteration with one
    # gradient-of-gradient pass and one (N, M_k+1) matmul; peak memory drops
    # from O(M_k * N * Q) to O(N * M_k). tests/test_mean_constant.py pins
    # equality with jax.hessian(objective).
    zeros_u = jnp.zeros(m_k, dtype=dtype)
    j_u = jax.jacfwd(predict)(zeros_u)  # (N, M_k), built once
    b_aug = jnp.concatenate(
        [jnp.ones((j_u.shape[0], 1), dtype=dtype), j_u], axis=1
    )
    prior_hess = jax.hessian(prior_only)(zeros_u)  # constant (quadratic prior)
    prior_block = (
        jnp.zeros((m_k + 1, m_k + 1), dtype=dtype).at[1:, 1:].set(prior_hess)
    )
    grad_f = jax.grad(data_sum)
    # Row sums of the f-Hessian == its diagonal for per-point-sum costs.
    hess_diag_f = jax.jit(jax.grad(lambda f: jnp.sum(grad_f(f))))

    @jax.jit
    def hessian(w):
        f = b_aug @ w
        h = hess_diag_f(f)
        return b_aug.T @ (h[:, None] * b_aug) + prior_block

    # ``initial_constant``: costs whose link is singular at f=0 (the Poisson
    # SQUARE link: -2 y log|f| -> +inf) need a nonzero start; e.g. pass
    # sqrt(mean counts) so the start reverts to the empirical mean rate.
    w = jnp.zeros(m_k + 1, dtype=dtype).at[0].set(initial_constant)
    value, grad = value_and_grad(w)
    if not bool(jnp.isfinite(value)):
        raise ValueError(
            "fit_mean_constant_map: objective is non-finite at the "
            f"m0={initial_constant} start — the cost/label configuration is "
            "invalid (links singular at f=0 need a nonzero initial_constant)"
        )
    eye = jnp.eye(m_k + 1, dtype=dtype)
    for _ in range(newton_iterations):
        if float(jnp.max(jnp.abs(grad))) < gradient_tolerance:
            break
        hess = hessian(w)
        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diag(hess))), 1.0)
        step = jnp.linalg.solve(hess + damping * scale * eye, grad)
        if not bool(jnp.all(jnp.isfinite(step))) or float(jnp.vdot(grad, step)) <= 0.0:
            # failed solve, or an indefinite Hessian produced an ascent
            # direction (possible for the non-convex costs): fall back to the
            # scaled gradient so the line search always has a descent
            # direction to work with
            step = grad / scale
        # backtracking line search: halve until the objective decreases
        t = 1.0
        for _ in range(30):
            w_new = w - t * step
            value_new, grad_new = value_and_grad(w_new)
            if bool(jnp.isfinite(value_new)) and float(value_new) <= float(value):
                break
            t *= 0.5
        else:
            break  # no decrease found in 30 halvings — converged/stuck
        converged = float(value) - float(value_new) < 1e-12 * max(
            1.0, abs(float(value))
        )
        w, value, grad = w_new, value_new, grad_new
        if converged:
            break
    return float(w[0])
