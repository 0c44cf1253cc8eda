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
