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
) -> float:
    """MAP-optimal prior mean constant for ``basis``/``cost``.

    Works for any basis (the prediction map is linear in the particles, so the
    constant is added outside ``calculate_untransformed_train_prediction_samples``)
    and any cost whose ``calculate_cost`` is differentiable. For convex costs
    (Gaussian, Bernoulli, Poisson, Student-T) the damped Newton iteration
    converges globally thanks to the backtracking line search; for non-convex
    costs (MultiModal) the result is a local optimum — callers should treat
    the mode as best-effort there.

    Returns the fitted constant as a Python float. The caller is expected to
    rebuild/replace the basis with ``mean_constant=m0`` before training.
    """
    if basis.mean_constant != 0.0:
        basis = basis.replace(mean_constant=0.0)
    m_k = basis.approximation_dimension
    dtype = basis.dtype

    def objective(w):
        m0, u = w[0], w[1:]
        f = basis.calculate_untransformed_train_prediction_samples(u[:, None]) + m0
        data_term = jnp.sum(cost.calculate_cost(f))
        # basis energy with cost=0 isolates the prior term (mean over the
        # single particle is the value itself)
        prior_term = basis.calculate_energy_potential(
            particles=u[:, None], cost=jnp.zeros((1,), dtype=f.dtype)
        )
        return data_term + prior_term

    value_and_grad = jax.jit(jax.value_and_grad(objective))
    hessian = jax.jit(jax.hessian(objective))

    w = jnp.zeros(m_k + 1, dtype=dtype)
    value, grad = value_and_grad(w)
    eye = jnp.eye(m_k + 1, dtype=dtype)
    for _ in range(newton_iterations):
        if not bool(jnp.isfinite(value)):
            # the zero start should always be finite; bail to m0=0 if not
            return 0.0
        if float(jnp.max(jnp.abs(grad))) < gradient_tolerance:
            break
        hess = hessian(w)
        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diag(hess))), 1.0)
        step = jnp.linalg.solve(hess + damping * scale * eye, grad)
        if not bool(jnp.all(jnp.isfinite(step))):
            step = grad / scale  # gradient fallback on a failed solve
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
        if float(value) - float(value_new) < 1e-12 * max(1.0, abs(float(value))):
            w, value, grad = w_new, value_new, grad_new
            break
        w, value, grad = w_new, value_new, grad_new
    return float(w[0])
