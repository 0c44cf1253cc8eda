"""Tests for the post-hoc gap-probe helpers
(experiments/uci/classification/analyse_gap.py).

The spread-temper probe is the classification analogue of the reference
temper layer (ref ``src/temper/base.py``: a scalar variance scale fit on a
calibration split): it contracts ONLY the latent dispersion, so on
synthetic latents whose spread is wrong by a known factor it must (a)
recover roughly that factor and (b) never lose to the untempered predictive
on the calibration split itself.
"""

import numpy as np
import pytest

from experiments.uci.classification.analyse_gap import (
    _nll,
    _temper_pls,
    _temper_svgp,
)


def _make_latents(rng, n, j, model_scale, true_scale=1.0):
    """Bernoulli data from a per-point latent f_true ~ N(m_i, true_scale^2);
    the model's latent SAMPLES are N(m_i, model_scale^2) — so the cloud is
    perfectly calibrated iff model_scale == true_scale, over-dispersed when
    model_scale > true_scale."""
    f_mean = rng.normal(0.0, 2.0, size=(n, 1))
    f_true = f_mean[:, 0] + true_scale * rng.normal(0.0, 1.0, size=(n,))
    y = (rng.uniform(size=(n,)) < 1.0 / (1.0 + np.exp(-f_true))).astype(float)
    f_samples = f_mean + model_scale * rng.normal(0.0, 1.0, size=(n, j))
    return f_samples, y


def test_temper_pls_contracts_overdispersed_cloud():
    rng = np.random.default_rng(0)
    f_val, y_val = _make_latents(rng, 400, 200, model_scale=3.0)
    f_test, y_test = _make_latents(rng, 400, 200, model_scale=3.0)
    nll_t, s = _temper_pls(f_val, y_val, f_test, y_test)
    raw = _nll(
        (1.0 / (1.0 + np.exp(-f_test))).mean(axis=1), y_test
    )
    assert s < 1.0  # over-dispersed cloud -> contraction
    assert nll_t < raw  # tempering helps out-of-sample too


def test_temper_pls_keeps_calibrated_cloud():
    rng = np.random.default_rng(1)
    f_val, y_val = _make_latents(rng, 2000, 200, model_scale=1.0)
    f_test, y_test = _make_latents(rng, 2000, 200, model_scale=1.0)
    nll_t, s = _temper_pls(f_val, y_val, f_test, y_test)
    raw = _nll((1.0 / (1.0 + np.exp(-f_test))).mean(axis=1), y_test)
    # a well-calibrated cloud needs no tempering: s near 1 and no blow-up
    assert 0.7 < s < 1.5
    assert nll_t < raw + 0.01


def test_temper_svgp_matches_pls_probe_on_same_gaussian():
    """The two probes implement the same transform (scale the latent spread)
    for the two predictive representations — on latents that ARE Gaussian
    samples, the tempered test NLLs must agree closely."""
    rng = np.random.default_rng(2)
    n, j = 500, 4000
    mu = rng.normal(0.0, 2.0, size=(n,))
    sigma = np.full(n, 3.0)
    y = (rng.uniform(size=(n,)) < 1.0 / (1.0 + np.exp(-mu))).astype(float)
    f = mu[:, None] + sigma[:, None] * rng.normal(0.0, 1.0, size=(n, j))
    half = n // 2
    nll_p, s_p = _temper_pls(f[:half], y[:half], f[half:], y[half:])
    nll_s, s_s = _temper_svgp(
        mu[:half], sigma[:half] ** 2, y[:half], mu[half:], sigma[half:] ** 2, y[half:]
    )
    assert abs(s_p - s_s) / s_s < 0.35  # same contraction, MC-noise apart
    assert nll_p == pytest.approx(nll_s, abs=0.02)
