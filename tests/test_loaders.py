"""Checkpoint save/load contracts (``experiments/loaders.py``).

The load-bearing one: a PLS checkpoint must reproduce its train-time
predictions on ANY backend/precision. Particles are coordinates in a basis;
the ONB basis is an eigh output whose eigenvector signs/order are not stable
across backends or gram dtypes for near-degenerate spectra (measured on the
breast_wdbc headline checkpoint: train NLL 0.106 at TPU train time, 2.51
after a CPU basis rebuild — results/checkpoint_basis_audit.md). So
``save_pls`` persists the basis and ``load_pls`` restores it verbatim instead
of trusting a rebuild. Reference checkpoints (``curves/regression/main.py:
259-267``) store particles only and silently carry the same hazard.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from experiments.loaders import load_pls, save_pls
from projected_langevin_sampling_tpu.models.basis import (
    build_inducing_point_basis,
    build_orthonormal_basis,
)
from projected_langevin_sampling_tpu.models.costs.gaussian import GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import (
    IdentityLinkFunction,
)
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel


def _toy_pls(basis_kind: str = "onb"):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 3)).astype(np.float32)
    z = x[:10]
    y = rng.normal(size=(40,)).astype(np.float32)
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.ones(3), outputscale=jnp.asarray(1.0)
        ),
        approximation_samples=z,
    )
    if basis_kind == "onb":
        basis = build_orthonormal_basis(
            kernel=kernel, x_induce=z, x_train=x, mean_constant=0.3,
            verbose=False,
        )
    else:
        basis = build_inducing_point_basis(
            kernel=kernel, x_induce=z, y_induce=y[:10], x_train=x,
            mean_constant=0.3,
        )
    cost = GaussianCost(
        y_train=y, link_function=IdentityLinkFunction(), observation_noise=1.0
    )
    pls = PLS(basis=basis, cost=cost, name="t")
    particles = pls.initialise_particles(
        number_of_particles=7, noise_only=True, seed=0
    )
    return x, pls, particles


def test_basis_carrying_checkpoint_survives_basis_rebuild_skew(tmp_path):
    """A sign-flipped rebuilt basis (the cross-backend eigh failure mode)
    corrupts predictions; the checkpointed basis restores them bitwise."""
    x, pls, particles = _toy_pls("onb")
    reference = np.asarray(pls.predict(x=x, particles=particles, key=0).mean)
    path = str(tmp_path / "pls.pkl")
    save_pls(
        path,
        particles=particles,
        observation_noise=1.0,
        best_lr=0.1,
        number_of_epochs=5,
        mean_constant=0.3,
        basis=pls.basis,
    )

    skewed_basis = pls.basis.replace(
        scaled_eigenvectors=-pls.basis.scaled_eigenvectors,
        train_projection=-pls.basis.train_projection,
    )
    skewed = PLS(basis=skewed_basis, cost=pls.cost, name="t")
    corrupted = np.asarray(skewed.predict(x=x, particles=particles, key=0).mean)
    assert np.abs(corrupted - reference).max() > 0.1  # the hazard is real

    loaded, _, best_lr, n_epochs = load_pls(path, pls=skewed)
    restored = np.asarray(skewed.predict(x=x, particles=loaded, key=0).mean)
    np.testing.assert_array_equal(restored, reference)
    assert skewed.basis.mean_constant == 0.3
    assert best_lr == 0.1 and n_epochs == 5


def test_basis_checkpoint_regrafts_caller_noise_distribution(tmp_path):
    """The predictive-noise object is caller-owned (stripped at save); load
    must graft the live model's one onto the restored basis."""
    x, pls, particles = _toy_pls("onb")
    path = str(tmp_path / "pls.pkl")
    save_pls(
        path,
        particles=particles,
        observation_noise=1.0,
        best_lr=None,
        number_of_epochs=1,
        basis=pls.basis,
    )
    sentinel = object()
    pls.basis = pls.basis.replace(
        additional_predictive_noise_distribution=sentinel
    )
    load_pls(path, pls=pls)
    assert pls.basis.additional_predictive_noise_distribution is sentinel


def test_old_format_checkpoint_falls_back_with_warning(tmp_path, capsys):
    x, pls, particles = _toy_pls("onb")
    reference = np.asarray(pls.predict(x=x, particles=particles, key=0).mean)
    path = str(tmp_path / "pls.pkl")
    save_pls(
        path,
        particles=particles,
        observation_noise=1.0,
        best_lr=0.1,
        number_of_epochs=5,
        mean_constant=0.3,
    )
    loaded, *_ = load_pls(path, pls=pls)
    out = capsys.readouterr().out
    assert "old-format checkpoint" in out
    np.testing.assert_array_equal(
        np.asarray(pls.predict(x=x, particles=loaded, key=0).mean), reference
    )


def test_inducing_point_basis_checkpoint_roundtrip(tmp_path):
    x, pls, particles = _toy_pls("ipb")
    reference = np.asarray(pls.predict(x=x, particles=particles, key=0).mean)
    path = str(tmp_path / "pls.pkl")
    save_pls(
        path,
        particles=particles,
        observation_noise=1.0,
        best_lr=0.2,
        number_of_epochs=3,
        basis=pls.basis,
    )
    fresh = PLS(basis=pls.basis, cost=pls.cost, name="t")
    loaded, *_ = load_pls(path, pls=fresh)
    np.testing.assert_array_equal(
        np.asarray(fresh.predict(x=x, particles=loaded, key=0).mean), reference
    )


def test_save_svgp_is_atomic_on_crash(tmp_path):
    """A save that raises mid-serialisation (e.g. model=None after every
    SVGP learning-rate candidate diverged) must leave NO file behind —
    otherwise the train-or-load existence check loads a truncated pickle on
    the retry (observed: 0-byte svgp-gaussian.pkl in the Poisson study)."""
    import os

    import pytest

    from experiments.loaders import save_svgp

    path = str(tmp_path / "svgp.pkl")
    with pytest.raises(AttributeError):
        save_svgp(path, None, None, None)
    assert not os.path.exists(path)
    assert os.listdir(tmp_path) == []  # no tmp litter either
