"""Ensemble-averaged kernels/likelihoods (reference ``experiments/constructors.py:9-53``).

The reference averages gpytorch state dicts parameter-wise (raw softplus
space); here ARD parameters are stored as positive values, so the average is
taken directly on the positive parameters — same intent (parameter-wise
ensemble average of the k subsample fits).
"""

from __future__ import annotations

import jax.numpy as jnp

from projected_langevin_sampling_tpu.models.gaussian_process import (
    ExactGP,
    GaussianLikelihood,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel


def construct_average_ard_kernel(kernels: list[ARDKernel]) -> ARDKernel:
    return ARDKernel(
        lengthscales=jnp.mean(jnp.stack([k.lengthscales for k in kernels]), axis=0),
        outputscale=jnp.mean(jnp.stack([k.outputscale for k in kernels]), axis=0),
    )


def construct_average_gaussian_likelihood(
    likelihoods: list[GaussianLikelihood],
) -> GaussianLikelihood:
    return GaussianLikelihood(
        noise=jnp.mean(jnp.stack([lik.noise for lik in likelihoods]), axis=0)
    )


def construct_average_gaussian_likelihood_from_models(
    models: list[ExactGP],
) -> GaussianLikelihood:
    return GaussianLikelihood(
        noise=jnp.mean(jnp.stack([m.noise for m in models]), axis=0)
    )


def construct_average_mean_constant(models: list[ExactGP]):
    return jnp.mean(jnp.stack([m.mean_constant for m in models]), axis=0)
