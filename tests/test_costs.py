"""Cost tests mirroring the reference's strategy (``tests/test_costs.py:24-60``):
predict types, hand-computed cost values, and closed-form vs autograd
derivative agreement for every cost x link combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_langevin_sampling_tpu.models.costs import (
    BernoulliCost,
    GaussianCost,
    MultiModalCost,
    PoissonCost,
    StudentTCost,
)
from projected_langevin_sampling_tpu.models.distributions import (
    Bernoulli,
    MultivariateNormal,
    Poisson,
    StudentTMarginals,
)
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
    ProbitLinkFunction,
    SigmoidLinkFunction,
    SquareLinkFunction,
)

N, J = 6, 4


@pytest.fixture
def f():
    return jnp.asarray(np.random.default_rng(0).normal(size=(N, J)) + 2.0)


def _costs(y_reg, y_bin, y_cnt):
    return [
        GaussianCost(y_train=y_reg, observation_noise=jnp.asarray(0.5)),
        BernoulliCost(y_train=y_bin),
        BernoulliCost(y_train=y_bin, link_function=ProbitLinkFunction()),
        PoissonCost(y_train=y_cnt),
        StudentTCost(y_train=y_reg, degrees_of_freedom=4.0, scale=1.3),
        MultiModalCost(
            y_train=y_reg,
            observation_noise=jnp.asarray(0.7),
            shift=2.0,
            bernoulli_noise=0.4,
        ),
    ]


@pytest.fixture
def all_costs():
    rng = np.random.default_rng(1)
    y_reg = jnp.asarray(rng.normal(size=N))
    y_bin = jnp.asarray((rng.uniform(size=N) > 0.5).astype(float))
    y_cnt = jnp.asarray(rng.poisson(3.0, size=N).astype(float))
    return _costs(y_reg, y_bin, y_cnt)


def test_gaussian_cost_value(f):
    y = jnp.zeros(N)
    cost = GaussianCost(y_train=y, observation_noise=jnp.asarray(2.0))
    expected = np.square(np.asarray(f)).sum(axis=0) / 4.0
    np.testing.assert_allclose(np.asarray(cost.calculate_cost(f)), expected, rtol=1e-10)


def test_gaussian_predict_moment_match(f):
    cost = GaussianCost(y_train=jnp.zeros(N), observation_noise=jnp.asarray(1.0))
    dist = cost.predict(f)
    assert isinstance(dist, MultivariateNormal)
    np.testing.assert_allclose(np.asarray(dist.mean), np.asarray(f).mean(axis=1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dist.variance), np.asarray(f).var(axis=1, ddof=1), rtol=1e-12
    )


def test_predict_types(all_costs, f):
    fpos = jnp.abs(f) + 0.1
    expected_types = [MultivariateNormal, Bernoulli, Bernoulli, Poisson, StudentTMarginals, type(None)]
    for cost, t in zip(all_costs, expected_types):
        samples = fpos if isinstance(cost, PoissonCost) else cost.link_function(f)
        assert isinstance(cost.predict(samples), t)


def test_closed_form_matches_autograd(all_costs, f):
    """Every closed-form derivative must equal the autograd fallback
    (reference asserts the same, ``tests/test_costs.py``)."""
    for cost in all_costs:
        if isinstance(cost, MultiModalCost):
            continue  # autograd-only by design (multimodal.py:79-91)
        closed = cost.calculate_cost_derivative(f)
        auto = cost.calculate_cost_derivative(f, force_autograd=True)
        np.testing.assert_allclose(
            np.asarray(closed), np.asarray(auto), rtol=1e-8, atol=1e-10,
            err_msg=f"{type(cost).__name__}",
        )


def test_autograd_derivative_is_per_particle_jacobian(f):
    """grad of the summed cost == per-particle Jacobian (columns decouple)."""
    cost = StudentTCost(
        y_train=jnp.zeros(N), degrees_of_freedom=3.0, link_function=SquareLinkFunction()
    )
    deriv = cost.calculate_cost_derivative(f, force_autograd=True)
    # finite differences on one entry
    eps = 1e-6
    f_pert = f.at[2, 1].add(eps)
    fd = (cost.calculate_cost(f_pert)[1] - cost.calculate_cost(f)[1]) / eps
    np.testing.assert_allclose(float(deriv[2, 1]), float(fd), rtol=1e-4)


def test_multimodal_cost_is_mixture_nll(f):
    y = jnp.zeros(N)
    sigma, shift, w = 0.7, 2.0, 0.4
    cost = MultiModalCost(
        y_train=y, observation_noise=jnp.asarray(sigma), shift=shift, bernoulli_noise=w
    )
    fv = np.asarray(f)
    def logpdf(e):
        return -0.5 * e**2 / sigma**2 - 0.5 * np.log(2 * np.pi * sigma**2)
    lik = w * np.exp(logpdf(-fv + shift)) + (1 - w) * np.exp(logpdf(-fv))
    expected = -np.log(lik).sum(axis=0)
    np.testing.assert_allclose(np.asarray(cost.calculate_cost(f)), expected, rtol=1e-8)


def test_sample_observation_noise_semantics():
    cost = GaussianCost(y_train=jnp.zeros(N), observation_noise=jnp.asarray(2.0))
    noise = cost.sample_observation_noise(50_000, key=jax.random.key(0))
    # observation_noise used directly as std (reference costs/base.py:86-115)
    assert abs(float(jnp.std(noise)) - 2.0) < 0.05
    no_noise = BernoulliCost(y_train=jnp.zeros(N)).sample_observation_noise(5)
    np.testing.assert_array_equal(np.asarray(no_noise), np.zeros(5))


def test_predict_samples_applies_link_and_noise(f):
    cost = BernoulliCost(y_train=jnp.zeros(N))
    obs = jnp.zeros(J)
    out = cost.predict_samples(f, observation_noise=obs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(cost.link_function(f)), rtol=1e-12
    )


def test_student_t_log_normalizer_stable_at_huge_df():
    """scipy.stats.t.fit returns df ~ 1e12 on near-Gaussian residuals; the
    on-device fp32 lgamma difference then cancels catastrophically (~14 nats
    — this silently inflated every svgp-student NLL in the round-3 UCI
    tables before the fix). The host-fp64 normalizer must agree with scipy's
    fp64 betaln route at small df and hit the Gaussian limit at huge df."""
    from scipy import special

    from projected_langevin_sampling_tpu.models.distributions import (
        student_t_log_normalizer,
    )

    for df in [2.5, 4.0, 443.0, 9.9e5]:
        exact = -special.betaln(df / 2.0, 0.5) - 0.5 * np.log(df)
        assert student_t_log_normalizer(df) == pytest.approx(exact, abs=1e-9)
    gauss = -0.5 * np.log(2.0 * np.pi)
    for df in [1.1e6, 1214001615188.936, 7.7e12]:
        assert student_t_log_normalizer(df) == pytest.approx(gauss, abs=1e-6)


def test_student_t_marginals_nll_matches_gaussian_at_huge_df_fp32():
    """End-to-end regression test for the fp32 cancellation: at df ~ 1e12 the
    Student-T marginals are Gaussian to ~1e-11, so the fp32 NLL must equal
    the Gaussian NLL — before the fix it was ~14 nats too large."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=64), dtype=jnp.float32)
    loc = jnp.asarray(rng.normal(size=64), dtype=jnp.float32)
    scale = jnp.full(64, 0.1, dtype=jnp.float32)
    st = StudentTMarginals(df=1214001615188.936, loc=loc, scale=scale)
    gauss_nll = float(
        jnp.mean(
            0.5 * jnp.log(2.0 * jnp.pi * scale**2)
            + 0.5 * jnp.square(y - loc) / scale**2
        )
    )
    assert float(st.negative_log_likelihood(y)) == pytest.approx(
        gauss_nll, abs=1e-3
    )
