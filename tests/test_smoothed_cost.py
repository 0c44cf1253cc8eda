"""Residual-smoothed Bernoulli cost (models/costs/smoothed_bernoulli.py).

Oracles:
- zero smoothing == the plain BernoulliCost (the softplus identity
  softplus(F) - y F == -y log p - (1 - y) log(1 - p) for the sigmoid link);
- the 16-node Gauss-Hermite quadrature vs a 96-node quadrature (numerical
  oracle for E_z[softplus(F + s z)]);
- closed-form derivative vs autograd through the quadrature cost;
- residual_smoothing_std: s^2 + Q_ii == k_ii under the nystrom scaling,
  zero at untruncated inducing points, and a hard error under the
  reference scaling (where B Lambda B^T is not Qff).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    make_smoothed_bernoulli_cost,
    residual_smoothing_std,
)
from projected_langevin_sampling_tpu.models.link_functions import SigmoidLinkFunction
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def _data(n=20, j=7, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.integers(0, 2, n).astype(np.float64))
    F = jnp.asarray(rng.normal(scale=2.0, size=(n, j)))
    s = jnp.asarray(rng.uniform(0.2, 1.5, n))
    return y, F, s


def test_zero_smoothing_matches_plain_bernoulli():
    y, F, _ = _data()
    plain = BernoulliCost(y_train=y, link_function=SigmoidLinkFunction())
    smoothed = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=jnp.zeros_like(y))
    np.testing.assert_allclose(
        np.asarray(smoothed.calculate_cost(F)),
        np.asarray(plain.calculate_cost(F)),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(smoothed.calculate_cost_derivative(F)),
        np.asarray(plain.calculate_cost_derivative(F)),
        atol=1e-10,
    )


def test_quadrature_matches_high_order_oracle():
    y, F, s = _data()
    c16 = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    c96 = make_smoothed_bernoulli_cost(
        y_train=y, smoothing_std=s, number_of_quadrature_nodes=96
    )
    np.testing.assert_allclose(
        np.asarray(c16.calculate_cost(F)), np.asarray(c96.calculate_cost(F)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c16.calculate_cost_derivative(F)),
        np.asarray(c96.calculate_cost_derivative(F)),
        atol=1e-6,
    )


def test_derivative_matches_autograd():
    y, F, s = _data()
    cost = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    np.testing.assert_allclose(
        np.asarray(cost.calculate_cost_derivative(F)),
        np.asarray(cost.calculate_cost_derivative(F, force_autograd=True)),
        atol=1e-8,
    )


def test_smoothing_raises_cost_above_plain():
    # E[softplus] >= softplus(E) by convexity: smoothing can only raise the cost.
    y, F, s = _data()
    plain = BernoulliCost(y_train=y, link_function=SigmoidLinkFunction())
    smoothed = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    assert np.all(
        np.asarray(smoothed.calculate_cost(F)) >= np.asarray(plain.calculate_cost(F))
    )


def _basis(scaling, threshold=None):
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (40, 1)), axis=0))
    z = x[::5]  # inducing points are a subset of train points
    kernel = ARDKernel(lengthscales=jnp.asarray([0.8]), outputscale=jnp.asarray(1.7))
    pls_kernel = PLSKernel(base_kernel=kernel, approximation_samples=z)
    basis = build_orthonormal_basis(
        pls_kernel,
        z,
        x,
        verbose=False,
        scaling=scaling,
        relative_eigenvalue_threshold=threshold,
    )
    return basis, kernel, x, z


def test_residual_std_is_nystrom_residual():
    basis, kernel, x, z = _basis("nystrom")
    s = residual_smoothing_std(basis, kernel(x, diag=True))
    k_diag = np.asarray(kernel(x, diag=True), dtype=np.float64)
    kxz = np.asarray(kernel(x, z), dtype=np.float64)
    kzz = np.asarray(kernel(z, z), dtype=np.float64)
    q_diag = np.sum(kxz * np.linalg.solve(kzz, kxz.T).T, axis=1)
    np.testing.assert_allclose(
        np.asarray(s) ** 2, np.clip(k_diag - q_diag, 0.0, None), atol=1e-6
    )
    # at the (untruncated) inducing points themselves the residual vanishes
    induce_rows = np.arange(0, 40, 5)
    assert np.all(np.asarray(s)[induce_rows] < 1e-3)


def test_residual_std_rejects_reference_scaling():
    basis, kernel, x, _ = _basis("reference")
    with pytest.raises(ValueError, match="nystrom"):
        residual_smoothing_std(basis, kernel(x, diag=True))


def test_integer_labels_promote_to_float():
    """Int {0,1} labels must not truncate the Gauss-Hermite rule to int
    (most 16-node weights round to zero — the cost would silently become
    ~ -y*F). The factory promotes everything to a float dtype and the cost
    matches the float-label construction exactly."""
    y, F, s = _data()
    smoothed_f = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    smoothed_i = make_smoothed_bernoulli_cost(
        y_train=y.astype(jnp.int32), smoothing_std=s
    )
    assert jnp.issubdtype(smoothed_i.gh_weights.dtype, jnp.floating)
    assert jnp.issubdtype(smoothed_i.y_train.dtype, jnp.floating)
    np.testing.assert_allclose(
        np.asarray(smoothed_i.calculate_cost(F)),
        np.asarray(smoothed_f.calculate_cost(F)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(smoothed_i.calculate_cost_derivative(F)),
        np.asarray(smoothed_f.calculate_cost_derivative(F)),
        rtol=1e-12,
    )


def test_low_precision_labels_floor_to_float32():
    """bf16 labels must not drag the Gauss-Hermite constants (weights span
    2.6e-10..0.5) down to an 8-bit mantissa — the factory floors the
    quadrature dtype at float32."""
    y, F, s = _data()
    smoothed = make_smoothed_bernoulli_cost(
        y_train=y.astype(jnp.bfloat16), smoothing_std=s
    )
    assert jnp.finfo(smoothed.gh_weights.dtype).bits >= 32
    assert jnp.finfo(smoothed.y_train.dtype).bits >= 32


def test_non_sigmoid_link_rejected_at_construction():
    """The quadrature identities are sigmoid-specific; constructing the class
    directly (bypassing the factory) with another link must fail fast instead
    of training sigmoid math behind a different predictive link."""
    from projected_langevin_sampling_tpu.models.costs import SmoothedBernoulliCost
    from projected_langevin_sampling_tpu.models.link_functions import (
        ProbitLinkFunction,
    )

    y, _, s = _data()
    nodes, weights = np.polynomial.hermite.hermgauss(16)
    with pytest.raises(NotImplementedError, match="sigmoid"):
        SmoothedBernoulliCost(
            y_train=y,
            smoothing_std=s,
            gh_nodes=jnp.asarray(nodes),
            gh_weights=jnp.asarray(weights),
            link_function=ProbitLinkFunction(),
        )


def test_accumulated_quadrature_matches_tensorised_form():
    """The node-by-node accumulation (O(N*J) live memory) must equal the
    explicit (N, J, Q) tensor contraction it replaced."""
    y, F, s = _data()
    cost = make_smoothed_bernoulli_cost(y_train=y, smoothing_std=s)
    z = (
        F[:, :, None]
        + jnp.sqrt(jnp.asarray(2.0, F.dtype)) * s[:, None, None] * cost.gh_nodes
    )
    expected_softplus = jnp.tensordot(
        jax.nn.softplus(z), cost.gh_weights, axes=[[2], [0]]
    ) / jnp.sqrt(jnp.asarray(jnp.pi, F.dtype))
    manual_cost = jnp.sum(expected_softplus - y[:, None] * F, axis=0)
    np.testing.assert_allclose(
        np.asarray(cost.calculate_cost(F)), np.asarray(manual_cost), rtol=1e-12
    )
