"""Link function tests (reference ``link_functions.py:6-80`` semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    ProbitLinkFunction,
    SigmoidLinkFunction,
    SquareLinkFunction,
)


@pytest.mark.parametrize(
    "link,fn",
    [
        (IdentityLinkFunction(), lambda y: y),
        (SquareLinkFunction(), np.square),
        (SigmoidLinkFunction(), lambda y: 1 / (1 + np.exp(-y))),
        (ProbitLinkFunction(), scipy.stats.norm.cdf),
    ],
)
def test_link_values(link, fn):
    y = np.linspace(-3, 3, 11)
    np.testing.assert_allclose(np.asarray(link(jnp.asarray(y))), fn(y), rtol=1e-7, atol=1e-12)


@pytest.mark.parametrize("link", [SigmoidLinkFunction(), ProbitLinkFunction()])
def test_probability_links_clip(link):
    y = jnp.asarray([-1e6, 1e6])
    out = np.asarray(link(y))
    assert out[0] == pytest.approx(link.jitter)
    assert out[1] == pytest.approx(1 - link.jitter)


def test_links_are_hashable_static_fields():
    assert hash(SigmoidLinkFunction()) == hash(SigmoidLinkFunction())
    assert SigmoidLinkFunction(1e-10) == SigmoidLinkFunction(1e-10)


@pytest.mark.parametrize("link", [SigmoidLinkFunction(), ProbitLinkFunction()])
def test_probability_links_clip_in_float32(link):
    """Regression (round 3): in float32, 1 - 1e-10 rounds to exactly 1.0, so
    the naive clip left saturated probabilities at 1.0 and the Bernoulli
    cost's log(1-p) returned -inf — which made every UCI-classification
    step-size candidate look diverged under the nystrom prior scale. The
    clip must stay strictly inside (0, 1) in EVERY working dtype."""
    y = jnp.asarray([-40.0, -20.0, 0.0, 20.0, 40.0], dtype=jnp.float32)
    p = link.transform(y)
    assert p.dtype == jnp.float32
    assert bool((p > 0.0).all()) and bool((p < 1.0).all())
    # the Bernoulli log-likelihood terms must be finite for both labels
    assert bool(jnp.isfinite(jnp.log(p)).all())
    assert bool(jnp.isfinite(jnp.log(1.0 - p)).all())
    # float64 keeps the reference's exact 1e-10 clip (parity unchanged)
    y64 = y.astype(jnp.float64)
    p64 = link.transform(y64)
    assert float(p64.min()) == 1e-10
    assert float(p64.max()) == 1.0 - 1e-10
