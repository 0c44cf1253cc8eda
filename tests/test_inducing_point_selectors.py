"""Selector tests (reference ``tests/test_inducing_point_selectors.py``):
greedy conditional-variance behaviour and random selection."""

import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.inducing_point_selectors import (
    ConditionalVarianceInducingPointSelector,
    RandomInducingPointSelector,
)
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, ard_gram


def _kernel():
    return ARDKernel(lengthscales=jnp.asarray([0.5]), outputscale=jnp.asarray(1.0))


def test_greedy_selects_diverse_points():
    """With an RBF kernel the greedy DPP-MAP must spread points out: the
    selected set's minimum pairwise distance should far exceed random's
    typical clumping on clustered data."""
    rng = np.random.default_rng(0)
    # two tight clusters + sparse spread
    x = np.concatenate(
        [rng.normal(0, 0.01, 50), rng.normal(5, 0.01, 50), np.linspace(-10, 15, 6)]
    )[:, None]
    selector = ConditionalVarianceInducingPointSelector()
    z, idx = selector(jnp.asarray(x), m=6, kernel=_kernel(), rng=np.random.default_rng(1))
    z = np.sort(np.asarray(z)[:, 0])
    # all six picks at least 1.0 apart despite 100/106 points being clumped
    assert np.min(np.diff(z)) > 1.0
    # indices map back to the original array (same set of values)
    np.testing.assert_allclose(
        np.sort(np.asarray(x)[np.asarray(idx), 0]), z, rtol=1e-12
    )


def test_greedy_indices_consistent_with_points():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 2))
    selector = ConditionalVarianceInducingPointSelector()
    z, idx = selector(jnp.asarray(x), m=5, kernel=_kernel(), rng=np.random.default_rng(3))
    np.testing.assert_allclose(np.asarray(z), x[np.asarray(idx)], rtol=1e-12)


def test_greedy_no_duplicates():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(30, 1))
    selector = ConditionalVarianceInducingPointSelector()
    _, idx = selector(jnp.asarray(x), m=10, kernel=_kernel(), rng=np.random.default_rng(5))
    idx = np.asarray(idx)
    assert len(np.unique(idx)) == len(idx)


def test_greedy_early_stop_on_threshold():
    """High threshold: tr(Kff-Qff) drops below it after a couple of picks."""
    x = np.linspace(-1, 1, 20)[:, None]
    selector = ConditionalVarianceInducingPointSelector(threshold=10.0)
    z, idx = selector(jnp.asarray(x), m=15, kernel=_kernel(), rng=np.random.default_rng(6))
    assert z.shape[0] < 15


def test_greedy_reduces_nystrom_error_vs_random():
    rng = np.random.default_rng(7)
    # clustered data: random selection oversamples the clump, greedy spreads
    x = np.concatenate([rng.normal(0, 0.05, 70), np.linspace(-8, 8, 10)])[:, None]
    kernel = _kernel()

    def nystrom_trace(z):
        k_xz = np.asarray(ard_gram(kernel, jnp.asarray(x), jnp.asarray(z)))
        k_zz = np.asarray(ard_gram(kernel, jnp.asarray(z), jnp.asarray(z)))
        q = k_xz @ np.linalg.solve(k_zz + 1e-10 * np.eye(len(z)), k_xz.T)
        return np.trace(np.asarray(ard_gram(kernel, jnp.asarray(x), jnp.asarray(x)))) - np.trace(q)

    greedy_z, _ = ConditionalVarianceInducingPointSelector()(
        jnp.asarray(x), m=8, kernel=kernel, rng=np.random.default_rng(8)
    )
    random_z, _ = RandomInducingPointSelector()(
        jnp.asarray(x), m=8, kernel=kernel, rng=np.random.default_rng(9)
    )
    assert nystrom_trace(np.asarray(greedy_z)) < nystrom_trace(np.asarray(random_z))


def test_random_selector_shapes_and_indices():
    rng = np.random.default_rng(10)
    x = rng.normal(size=(25, 3))
    z, idx = RandomInducingPointSelector()(
        jnp.asarray(x), m=7, kernel=None, rng=np.random.default_rng(11)
    )
    assert z.shape == (7, 3)
    np.testing.assert_allclose(np.asarray(z), x[np.asarray(idx)], rtol=1e-12)
