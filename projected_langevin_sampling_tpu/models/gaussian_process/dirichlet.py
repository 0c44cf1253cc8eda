"""Dirichlet-based classification targets (Milios et al. 2018, "Dirichlet-
based Gaussian Processes for Large-scale Calibrated Classification").

The reference's classification experiments learn kernel hyperparameters by
regressing on Dirichlet-transformed labels via
``gpytorch.likelihoods.DirichletClassificationLikelihood``
(``/root/reference/experiments/uci/classification/main.py:133-138``,
``curves/classification/main.py:162-166``): labels are mapped to logit-scale
targets with per-point fixed noise, one GP per class, and the learned kernels
averaged. Skipping this transform (fitting on raw 0/1 labels) learns an
outputscale ~100x too small — the function-space prior then cannot move the
sigmoid off 0.5, which flattens every classification probability. This module
is the JAX equivalent of gpytorch's ``_prepare_targets``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def dirichlet_classification_targets(
    labels: Array, alpha_epsilon: float = 0.01
) -> tuple[Array, Array, int]:
    """Transform integer class labels into per-class regression targets.

    Matches gpytorch ``DirichletClassificationLikelihood._prepare_targets``:
        alpha[c, i] = alpha_epsilon (+1 when labels[i] == c)
        sigma2[c, i] = log(1/alpha + 1)
        target[c, i] = log(alpha) - sigma2/2

    Returns (targets (C, N), noise_variances (C, N), num_classes). The noise
    variances are the FIXED heteroscedastic observation noise of the
    class-c regression (``FixedNoiseGaussianLikelihood``); with
    ``learn_additional_noise=True`` the reference adds a learned scalar on
    top — pass these as ``fixed_noise_variances`` to ``fit_exact_gp``.
    """
    import numpy as np

    labels = jnp.asarray(labels)
    # host fp64 (runs once per experiment; avoids the x64-disabled downcast)
    int_labels = np.asarray(jax.device_get(labels)).astype(np.int64)
    num_classes = int(int_labels.max()) + 1
    one_hot = np.eye(num_classes, dtype=np.float64)[int_labels].T  # (C, N)
    alpha = alpha_epsilon + one_hot
    sigma2 = np.log(1.0 / alpha + 1.0)
    targets = np.log(alpha) - 0.5 * sigma2
    dtype = labels.dtype if jnp.issubdtype(labels.dtype, jnp.floating) else jnp.float32
    return jnp.asarray(targets, dtype), jnp.asarray(sigma2, dtype), num_classes
