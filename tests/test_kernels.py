"""Kernel tests — exact gram values against hand/numpy computations,
mirroring the reference's inner-product-kernel strategy (``tests/test_pls_kernel.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.ops.kernels import (
    ARDKernel,
    PLSKernel,
    ard_gram,
    augment_approximation_samples,
    pls_gram,
    squared_distance,
)


@pytest.fixture
def kernel():
    return ARDKernel(
        lengthscales=jnp.array([1.3, 0.7]), outputscale=jnp.asarray(2.0)
    )


def test_squared_distance_matches_numpy():
    rng = np.random.default_rng(0)
    x1, x2 = rng.normal(size=(7, 3)), rng.normal(size=(5, 3))
    expected = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(squared_distance(jnp.asarray(x1), jnp.asarray(x2))),
        expected,
        rtol=1e-12,
    )


def test_ard_gram_matches_direct_formula(kernel):
    rng = np.random.default_rng(1)
    x1, x2 = rng.normal(size=(6, 2)), rng.normal(size=(4, 2))
    ls = np.array([1.3, 0.7])
    d2 = (((x1[:, None, :] - x2[None, :, :]) / ls) ** 2).sum(-1)
    expected = 2.0 * np.exp(-0.5 * d2)
    np.testing.assert_allclose(
        np.asarray(ard_gram(kernel, jnp.asarray(x1), jnp.asarray(x2))),
        expected,
        rtol=1e-10,
    )


def test_ard_gram_diag_equals_full_diagonal(kernel):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 2)))
    full = ard_gram(kernel, x, x)
    diag = ard_gram(kernel, x, x, diag=True)
    np.testing.assert_allclose(np.diag(np.asarray(full)), np.asarray(diag), rtol=1e-12)


def test_ard_gram_1d_inputs_promoted(kernel1d=ARDKernel(jnp.array([1.0]), jnp.asarray(1.0))):
    x = jnp.array([0.0, 1.0, 2.0])
    gram = ard_gram(kernel1d, x, x)
    assert gram.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(gram[0, 1]), np.exp(-0.5), rtol=1e-12)


def test_pls_gram_definition(kernel):
    """r(x1,x2) = (1/S) k(x1,Z) k(Z,x2) — reference kernel.py:40-76."""
    rng = np.random.default_rng(3)
    x1, x2, z = (
        jnp.asarray(rng.normal(size=(4, 2))),
        jnp.asarray(rng.normal(size=(3, 2))),
        jnp.asarray(rng.normal(size=(8, 2))),
    )
    g1 = np.asarray(ard_gram(kernel, x1, z))
    g2 = np.asarray(ard_gram(kernel, x2, z))
    expected = g1 @ g2.T / 8
    np.testing.assert_allclose(
        np.asarray(pls_gram(kernel, x1, x2, z)), expected, rtol=1e-10
    )
    pk = PLSKernel(base_kernel=kernel, approximation_samples=z)
    np.testing.assert_allclose(np.asarray(pk.forward(x1, x2)), expected, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(pk.forward(x1[:3], x1[:3], diag=True)),
        np.diag(np.asarray(pk.forward(x1[:3], x1[:3]))),
        rtol=1e-10,
    )


def test_augmentation_dedups_rows(kernel):
    z = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    extra = jnp.asarray([[0.0, 1.0], [4.0, 5.0]])
    merged = augment_approximation_samples(z, extra)
    assert merged.shape == (3, 2)
    # sorted row order (np.unique semantics, matching torch.unique(dim=0))
    np.testing.assert_allclose(
        np.asarray(merged), [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]]
    )


def test_pls_kernel_augmentation_changes_normalisation(kernel):
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(5, 2)))
    x = jnp.asarray(rng.normal(size=(3, 2)))
    pk = PLSKernel(base_kernel=kernel, approximation_samples=z)
    plain = pk.forward(x, x)
    augmented = pk.forward(x, x, additional_approximation_samples=x)
    # 8 unique samples now; values must differ from the unaugmented gram
    assert not np.allclose(np.asarray(plain), np.asarray(augmented))


def test_squared_distance_full_precision_cross_term():
    """The distance expansion's cross matmul must NOT run with reduced-
    precision operands: on TPU the default fp32 matmul uses bf16 MXU inputs
    (~1e-3 relative), which inside this cancellation produced gram errors
    of 1.6e-2 and left duplicate-row kernels indefinite by 0.03 (iris_petal
    — every K + sigma^2 I factorisation NaN'd on chip). With
    Precision.HIGHEST the same measurement reads 7.7e-7. On CPU both paths
    agree; this asserts the numerical contract against a float64 oracle so
    a precision regression shows up on any backend where it matters."""
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    x[10] = x[3]  # exact duplicates
    x[11] = x[3]
    d2 = np.asarray(squared_distance(jnp.asarray(x), jnp.asarray(x)))
    x64 = x.astype(np.float64)
    d2_ref = ((x64[:, None, :] - x64[None, :, :]) ** 2).sum(-1)
    assert np.abs(d2 - d2_ref).max() < 1e-4


def test_same_input_gram_diag_and_duplicates_are_consistent():
    """Same-input grams: the diagonal is exactly outputscale (gpytorch's
    x1_eq_x2 fill_diagonal(0) semantics) and never falls below an exact-
    duplicate off-diagonal — the ordering whose violation made
    K + sigma^2 I indefinite."""
    import numpy as np

    rng = np.random.default_rng(3)
    x = rng.normal(size=(32, 3)).astype(np.float32) * 3.0
    x[5] = x[2]
    k = ARDKernel(
        lengthscales=jnp.asarray([4.6, 16.1, 1.3], dtype=jnp.float32),
        outputscale=jnp.asarray(1.186, dtype=jnp.float32),
    )
    xj = jnp.asarray(x)  # the same-object call every model path makes
    gram = np.asarray(k(xj, xj))
    np.testing.assert_array_equal(np.diagonal(gram), np.full(32, 1.186, np.float32))
    assert gram[2, 5] <= gram[2, 2]
