"""GP baseline trainers — the optax counterpart of the reference's
``experiments/trainers.py:15-136`` (Adam on the exact MLL; SGD on the
minibatched variational ELBO, with optional frozen kernel/noise parameters).

Positive parameters (lengthscales, outputscale, noise) are optimised in
log-space. One gradient step is one jitted function; the epoch loop stays on
the host so early stopping matches the reference's eager semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from projected_langevin_sampling_tpu.models.gaussian_process.exact_gp import ExactGP
from projected_langevin_sampling_tpu.models.gaussian_process.likelihoods import (
    GaussianLikelihood,
    StudentTLikelihood,
)
from projected_langevin_sampling_tpu.models.gaussian_process.svgp import SVGP
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
from projected_langevin_sampling_tpu.utils.early_stopper import EarlyStopper
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


# --------------------------------------------------------------------------
# Exact GP
# --------------------------------------------------------------------------
def _exact_gp_from_params(params, x, y) -> ExactGP:
    return ExactGP(
        mean_constant=params["mean_constant"],
        kernel=ARDKernel(
            lengthscales=jnp.exp(params["log_lengthscales"]),
            outputscale=jnp.exp(params["log_outputscale"]),
        ),
        noise=jnp.exp(params["log_noise"]),
        x_train=x,
        y_train=y,
    )


def fit_exact_gp(
    x: Array,
    y: Array,
    kernel: ARDKernel,
    noise: float = 1.0,
    mean_constant: float = 0.0,
    learning_rate: float = 0.1,
    number_of_epochs: int = 100,
    early_stopper_patience: float = float("inf"),
) -> tuple[ExactGP, list[float]]:
    """Adam on the negative exact MLL (reference ``trainers.py:15-52``)."""
    x = jnp.asarray(x)
    x = x[:, None] if x.ndim == 1 else x
    y = jnp.asarray(y)
    dtype = x.dtype
    params = {
        "mean_constant": jnp.asarray(mean_constant, dtype=dtype),
        "log_lengthscales": jnp.log(jnp.asarray(kernel.lengthscales, dtype=dtype)),
        "log_outputscale": jnp.log(jnp.asarray(kernel.outputscale, dtype=dtype)),
        "log_noise": jnp.log(jnp.asarray(noise, dtype=dtype)),
    }
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: -_exact_gp_from_params(p, x, y).log_marginal_likelihood()
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    losses: list[float] = []
    stopper = EarlyStopper(patience=early_stopper_patience)
    for _ in range(number_of_epochs):
        loss, new_params, new_opt_state = step(params, opt_state)
        loss = float(loss)
        if stopper.should_stop(loss=loss, step_size=learning_rate):
            break
        losses.append(loss)
        params, opt_state = new_params, new_opt_state
    return _exact_gp_from_params(params, x, y), losses


# --------------------------------------------------------------------------
# SVGP
# --------------------------------------------------------------------------
def _base_ard(kernel):
    """The ARD leaf of a kernel — handles both a bare ARDKernel and a
    PLSKernel wrapping one (the reference's SVGP baselines are built on the
    PLS r-kernel, curves/regression/main.py:315-320)."""
    from projected_langevin_sampling_tpu.ops.kernels import PLSKernel

    return kernel.base_kernel if isinstance(kernel, PLSKernel) else kernel


def _rebuild_kernel(template, log_lengthscales, log_outputscale):
    from projected_langevin_sampling_tpu.ops.kernels import PLSKernel

    ard = ARDKernel(
        lengthscales=jnp.exp(log_lengthscales), outputscale=jnp.exp(log_outputscale)
    )
    if isinstance(template, PLSKernel):
        return template.replace(base_kernel=ard)
    return ard


def _svgp_params(svgp: SVGP, learn_inducing_locations: bool):
    ard = _base_ard(svgp.kernel)
    params = {
        "mean_constant": svgp.mean_constant,
        "log_lengthscales": jnp.log(ard.lengthscales),
        "log_outputscale": jnp.log(ard.outputscale),
        "variational_mean": svgp.variational_mean,
        "variational_chol": svgp.variational_chol,
    }
    if hasattr(svgp.likelihood, "noise"):
        params["log_noise"] = jnp.log(svgp.likelihood.noise)
    if learn_inducing_locations:
        params["x_induce"] = svgp.x_induce
    return params


def _svgp_from_params(params, template: SVGP) -> SVGP:
    likelihood = template.likelihood
    if "log_noise" in params:
        likelihood = likelihood.replace(noise=jnp.exp(params["log_noise"]))
    return template.replace(
        mean_constant=params["mean_constant"],
        kernel=_rebuild_kernel(
            template.kernel, params["log_lengthscales"], params["log_outputscale"]
        ),
        likelihood=likelihood,
        variational_mean=params["variational_mean"],
        variational_chol=params["variational_chol"],
        x_induce=params.get("x_induce", template.x_induce),
    )


def fit_svgp(
    svgp: SVGP,
    x: Array,
    y: Array,
    number_of_epochs: int,
    batch_size: int,
    learning_rate: float,
    learn_inducing_locations: bool = False,
    learn_kernel_parameters: bool = True,
    learn_observation_noise: bool = True,
    early_stopper_patience: float = float("inf"),
    key: KeyArray | int | None = None,
) -> tuple[SVGP | None, list[float] | None]:
    """SGD on the minibatched negative ELBO (reference ``trainers.py:55-136``).

    Frozen-parameter flags mirror the reference's parameter-set subtraction:
    ``learn_kernel_parameters=False`` freezes lengthscales/outputscale;
    ``learn_observation_noise=False`` freezes the likelihood noise.
    Returns (None, None) if training produced non-finite parameters, like the
    reference's ValueError catch (``trainers.py:131-134``).
    """
    x = jnp.asarray(x)
    x = x[:, None] if x.ndim == 1 else x
    y = jnp.asarray(y)
    n = x.shape[0]
    batch_size = min(batch_size, n)
    key = as_key(key)

    params = _svgp_params(svgp, learn_inducing_locations)
    frozen = set()
    if not learn_kernel_parameters:
        frozen |= {"log_lengthscales", "log_outputscale"}
    if not learn_observation_noise and "log_noise" in params:
        frozen |= {"log_noise"}

    optimizer = optax.sgd(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, x_batch, y_batch):
        loss, grads = jax.value_and_grad(
            lambda p: -_svgp_from_params(p, svgp).elbo(x_batch, y_batch, n)
        )(params)
        grads = {k: (jnp.zeros_like(v) if k in frozen else v) for k, v in grads.items()}
        updates, opt_state = optimizer.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    @jax.jit
    def full_loss(params):
        return -_svgp_from_params(params, svgp).elbo(x, y, n)

    losses: list[float] = []
    stopper = EarlyStopper(patience=early_stopper_patience)
    num_batches = max(n // batch_size, 1)
    for _ in range(number_of_epochs):
        key, shuffle_key = jax.random.split(key)
        order = jax.random.permutation(shuffle_key, n)
        for b in range(num_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            _, params, opt_state = step(params, opt_state, x[idx], y[idx])
        loss = float(full_loss(params))
        if not np.isfinite(
            float(sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(params)))
        ):
            return None, None
        if stopper.should_stop(loss=loss, step_size=learning_rate):
            break
        losses.append(loss)
    return _svgp_from_params(params, svgp), losses
