"""GP baseline trainers — the optax counterpart of the reference's
``experiments/trainers.py:15-136`` (Adam on the exact MLL; SGD on the
minibatched variational ELBO, with optional frozen kernel/noise parameters).

Positive parameters (lengthscales, outputscale, noise) are optimised in
log-space. Like ``train_pls``, the WHOLE epoch loop is one jitted
``lax.scan`` with the early stopper carried as scan state (a ``stopped``
flag freezes the parameters), preserving each reference trainer's exact
break semantics: the exact-GP stopper DISCARDS the stopping epoch's update
(``trainers.py:36-44``) while the SVGP stopper adopts it (``:117-130``); the
stopping epoch's loss is never recorded. One dispatch per training run
instead of one per epoch — on this machine's tunneled TPU (~35 ms/dispatch)
and 1-core CPU that is the difference between seconds and hours at the UCI
configs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from projected_langevin_sampling_tpu.models.gaussian_process.exact_gp import ExactGP
from projected_langevin_sampling_tpu.models.gaussian_process.likelihoods import (
    GaussianLikelihood,
    StudentTLikelihood,
)
from projected_langevin_sampling_tpu.models.gaussian_process.svgp import SVGP
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel
from projected_langevin_sampling_tpu.utils.prng import KeyArray, as_key

Array = jax.Array


def _drain_chunks(worker, number_of_epochs: int, stopped_index: int):
    """Run a jitted scan worker in bounded chunks (shared by fit_exact_gp and
    fit_svgp): each chunk is one device program (Cholesky-per-step trainers
    get a 50x smaller chunk than the Langevin scan), the full carry threads
    through so the chunked run is bit-identical to a single scan, and no more
    chunks launch once the in-scan stopper (``carry[stopped_index]``) fires.

    ``worker(carry_or_None, n_epochs) -> (carry, loss_trace, recorded)``.
    Returns (final carry or None when number_of_epochs == 0, recorded losses).
    """
    from projected_langevin_sampling_tpu.training import _SCAN_CHUNK_STEPS

    chunk = max(1, _SCAN_CHUNK_STEPS // 50)
    remaining = int(number_of_epochs)
    carry = None
    losses: list[float] = []
    while remaining > 0:
        n_epochs = min(chunk, remaining)
        carry, loss_trace, recorded = worker(carry, n_epochs)
        losses += [
            float(l) for l, r in zip(loss_trace.tolist(), recorded.tolist()) if r
        ]
        remaining -= n_epochs
        if bool(carry[stopped_index]):
            break
    return carry, losses


# --------------------------------------------------------------------------
# Exact GP
# --------------------------------------------------------------------------
def _exact_gp_from_params(params, x, y, fixed_noise_variances=None) -> ExactGP:
    return ExactGP(
        mean_constant=params["mean_constant"],
        kernel=ARDKernel(
            lengthscales=jnp.exp(params["log_lengthscales"]),
            outputscale=jnp.exp(params["log_outputscale"]),
        ),
        noise=jnp.exp(params["log_noise"]),
        x_train=x,
        y_train=y,
        fixed_noise_variances=fixed_noise_variances,
    )


@functools.partial(jax.jit, static_argnames=("number_of_epochs",))
def _run_exact_gp(params, x, y, fixed_noise_variances, learning_rate, patience,
                  number_of_epochs: int, carry_in=None):
    """Module-level jitted worker: defining the jit INSIDE fit_exact_gp would
    recompile on every call (each closure is a fresh cache key) — with the
    tunneled TPU's 1-3 s compiles that dominated the whole harness.

    ``carry_in``: optional (params, opt_state, min_loss, sim_time, stopped)
    from a previous chunk — ``fit_exact_gp`` splits very long fits into
    bounded device programs (same rationale as training._train_pls_chunked:
    a 100k-iteration Cholesky-per-step scan can crash the TPU tunnel)."""
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    def step(params, opt_state):
        # gpytorch's ExactMarginalLogLikelihood returns the PER-DATA-POINT
        # MLL — match that loss scale (recorded losses + stopper comparisons)
        loss, grads = jax.value_and_grad(
            lambda p: -_exact_gp_from_params(
                p, x, y, fixed_noise_variances
            ).log_marginal_likelihood()
            / y.shape[0]
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    def body(carry, _):
        params, opt_state, min_loss, sim_time, stopped = carry
        loss, new_params, new_opt_state = step(params, opt_state)
        finite = jnp.isfinite(loss)
        improved = loss < min_loss
        sim_time_new = jnp.where(improved, 0.0, sim_time + learning_rate)
        stop_now = (~finite) | ((~improved) & (sim_time_new >= patience))
        adopt = (~stopped) & (~stop_now)  # the stopping update is discarded
        params = jax.tree.map(
            lambda old, new: jnp.where(adopt, new, old), params, new_params
        )
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(adopt, new, old), opt_state, new_opt_state
        )
        min_loss = jnp.where(adopt & improved, loss, min_loss)
        sim_time = jnp.where(stopped, sim_time, sim_time_new)
        recorded = adopt
        return (params, opt_state, min_loss, sim_time, stopped | stop_now), (
            loss,
            recorded,
        )

    dtype = x.dtype
    init = (
        params,
        opt_state,
        jnp.asarray(jnp.inf, dtype=dtype),
        jnp.asarray(0.0, dtype=dtype),
        jnp.asarray(False),
    ) if carry_in is None else carry_in
    carry_out, (losses, recorded) = jax.lax.scan(
        body, init, None, length=number_of_epochs
    )
    return carry_out, losses, recorded


def fit_exact_gp(
    x: Array,
    y: Array,
    kernel: ARDKernel,
    noise: float = 1.0,
    mean_constant: float = 0.0,
    learning_rate: float = 0.1,
    number_of_epochs: int = 100,
    early_stopper_patience: float = float("inf"),
    fixed_noise_variances: Array | None = None,
) -> tuple[ExactGP, list[float]]:
    """Adam on the negative exact MLL (reference ``trainers.py:15-52``).

    ``fixed_noise_variances``: per-point heteroscedastic noise added to the
    learned scalar (the Dirichlet classification case — gpytorch
    ``FixedNoiseGaussianLikelihood(learn_additional_noise=True)``)."""
    x = jnp.asarray(x)
    x = x[:, None] if x.ndim == 1 else x
    y = jnp.asarray(y)
    if fixed_noise_variances is not None:
        fixed_noise_variances = jnp.asarray(fixed_noise_variances, dtype=x.dtype)
    dtype = x.dtype
    params = {
        "mean_constant": jnp.asarray(mean_constant, dtype=dtype),
        "log_lengthscales": jnp.log(jnp.asarray(kernel.lengthscales, dtype=dtype)),
        "log_outputscale": jnp.log(jnp.asarray(kernel.outputscale, dtype=dtype)),
        "log_noise": jnp.log(jnp.asarray(noise, dtype=dtype)),
    }
    patience = jnp.asarray(early_stopper_patience, dtype=x.dtype)
    lr = jnp.asarray(learning_rate, dtype=x.dtype)
    # chunked: bound each device program (see _run_exact_gp docstring) and
    # stop launching chunks once the in-scan stopper has fired
    carry, losses = _drain_chunks(
        lambda carry, n: _run_exact_gp(
            params, x, y, fixed_noise_variances, lr, patience, n, carry
        ),
        number_of_epochs=number_of_epochs,
        stopped_index=4,
    )
    if carry is not None:  # number_of_epochs == 0 -> return the init params
        params = carry[0]
    return _exact_gp_from_params(params, x, y, fixed_noise_variances), losses


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

    num_batches = max(n // batch_size, 1)
    patience = jnp.asarray(early_stopper_patience, dtype=x.dtype)
    lr = jnp.asarray(learning_rate, dtype=x.dtype)
    # chunked: bound each device program; the key rides the carry so the
    # chunked run is bit-identical to the single-scan run
    carry, losses = _drain_chunks(
        lambda carry, n_epochs: _run_svgp(
            params, svgp, x, y, key, lr, patience,
            number_of_epochs=n_epochs,
            batch_size=int(batch_size),
            num_batches=int(num_batches),
            frozen=tuple(sorted(frozen)),
            carry_in=carry,
        ),
        number_of_epochs=number_of_epochs,
        stopped_index=5,  # stopped (includes the bad case)
    )
    if carry is None:  # number_of_epochs == 0 -> return the init model
        return _svgp_from_params(params, svgp), losses
    if bool(carry[6]):  # bad: non-finite parameters adopted
        return None, None
    return _svgp_from_params(carry[0], svgp), losses


@functools.partial(
    jax.jit,
    static_argnames=("number_of_epochs", "batch_size", "num_batches", "frozen"),
)
def _run_svgp(params, svgp, x, y, key, learning_rate, patience,
              number_of_epochs: int, batch_size: int, num_batches: int,
              frozen: tuple, carry_in=None):
    """Module-level jitted worker (see _run_exact_gp for why).

    ``carry_in``: full scan carry from a previous chunk (``fit_svgp``
    bounds device-program length). The PRNG key is part of the carry, so
    the chunked run is BIT-IDENTICAL to the single-scan run."""
    n = x.shape[0]
    optimizer = optax.sgd(learning_rate)
    opt_state = optimizer.init(params)

    def step(params, opt_state, x_batch, y_batch):
        # gpytorch's VariationalELBO is PER-DATA-POINT; plain SGD at the
        # reference's learning-rate grid is only stable at that scale (the
        # summed ELBO's gradients are N times larger and diverge in epochs)
        loss, grads = jax.value_and_grad(
            lambda p: -_svgp_from_params(p, svgp).elbo(x_batch, y_batch, n) / n
        )(params)
        grads = {k: (jnp.zeros_like(v) if k in frozen else v) for k, v in grads.items()}
        updates, opt_state = optimizer.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    def run(params, opt_state, key):
        def epoch_body(carry, _):
            params, opt_state, key, min_loss, sim_time, stopped, bad = carry
            key, shuffle_key = jax.random.split(key)
            order = jax.random.permutation(shuffle_key, n)

            def batch_body(b, state):
                params, opt_state = state
                idx = jax.lax.dynamic_slice(order, (b * batch_size,), (batch_size,))
                _, params, opt_state = step(params, opt_state, x[idx], y[idx])
                return params, opt_state

            new_params, new_opt_state = jax.lax.fori_loop(
                0, num_batches, batch_body, (params, opt_state)
            )
            # partial final batch: the reference's DataLoader includes it
            # (torch DataLoader default drop_last=False) — every point of the
            # shuffled order is visited exactly once per epoch. rem is static
            # (shapes are), so this is a separately-traced fixed-shape step.
            rem = n - num_batches * batch_size
            if rem:
                tail = jax.lax.dynamic_slice(order, (num_batches * batch_size,), (rem,))
                _, new_params, new_opt_state = step(
                    new_params, new_opt_state, x[tail], y[tail]
                )
            loss = -_svgp_from_params(new_params, svgp).elbo(x, y, n) / n

            # reference semantics (trainers.py:55-136): the epoch's updates are
            # adopted, THEN non-finite params abort, THEN the stopper may break
            # (the stopping epoch's loss is not recorded)
            bad_now = ~jnp.asarray(
                jnp.all(
                    jnp.stack(
                        [jnp.all(jnp.isfinite(v)) for v in jax.tree.leaves(new_params)]
                    )
                )
            )
            adopt = ~stopped & ~bad
            params = jax.tree.map(
                lambda old, new: jnp.where(adopt, new, old), params, new_params
            )
            opt_state = jax.tree.map(
                lambda old, new: jnp.where(adopt, new, old), opt_state, new_opt_state
            )
            finite = jnp.isfinite(loss)
            improved = loss < min_loss
            sim_time_new = jnp.where(improved, 0.0, sim_time + learning_rate)
            stop_now = (~finite) | ((~improved) & (sim_time_new >= patience))
            recorded = adopt & ~bad_now & ~stop_now
            min_loss = jnp.where(adopt & improved, loss, min_loss)
            sim_time = jnp.where(stopped | bad, sim_time, sim_time_new)
            stopped = stopped | stop_now | bad_now
            bad = bad | (adopt & bad_now)
            return (params, opt_state, key, min_loss, sim_time, stopped, bad), (
                loss,
                recorded,
            )

        dtype = x.dtype
        init = (
            params,
            opt_state,
            key,
            jnp.asarray(jnp.inf, dtype=dtype),
            jnp.asarray(0.0, dtype=dtype),
            jnp.asarray(False),
            jnp.asarray(False),
        ) if carry_in is None else carry_in
        carry, (losses, recorded) = jax.lax.scan(
            epoch_body, init, None, length=number_of_epochs
        )
        return carry, losses, recorded

    return run(params, opt_state, key)
