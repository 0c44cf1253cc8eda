"""Chunked long-run driver (``training._train_pls_chunked``).

The reference protocol's smallest step-size candidates run up to 1e7 steps
(``experiments/uci/*/main.py`` via maximum_number_of_steps); a single
1e7-step device program is both fragile (the TPU tunnel kills multi-minute
programs) and wasteful (the in-scan early stop still iterates the remaining
steps). The chunked driver bounds each program and stops launching chunks
once the stopper fires. Verified here:

  * the host-side stopper replay (vectorised) matches a per-step Python
    replay of the in-scan EarlyStopper transition;
  * once the stopper fires, no further chunks are launched (the energy
    trace is shorter than number_of_epochs);
  * the chunked stationary law matches the unchunked scan's moments.
"""

import jax
import jax.numpy as jnp
import numpy as np

from projected_langevin_sampling_tpu.models.basis import build_orthonormal_basis
from projected_langevin_sampling_tpu.models.costs import GaussianCost
from projected_langevin_sampling_tpu.models.link_functions import IdentityLinkFunction
from projected_langevin_sampling_tpu.models.pls import PLS
from projected_langevin_sampling_tpu.ops.kernels import ARDKernel, PLSKernel
from projected_langevin_sampling_tpu.training import (
    _train_pls_chunked,
    _train_pls_scan,
    train_pls,
)
from projected_langevin_sampling_tpu.utils.prng import as_key


def _problem(n=60, m=12):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, (n, 1)), axis=0))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.15 * rng.normal(size=n))
    kernel = PLSKernel(
        base_kernel=ARDKernel(
            lengthscales=jnp.asarray([0.8]), outputscale=jnp.asarray(1.0)
        ),
        approximation_samples=x,
    )
    z = jnp.asarray(np.linspace(-2.9, 2.9, m)[:, None])
    basis = build_orthonormal_basis(kernel, z, x, eigenvalue_threshold=1e-3, verbose=False)
    cost = GaussianCost(
        observation_noise=jnp.asarray(0.15**2),
        y_train=y,
        link_function=IdentityLinkFunction(),
    )
    return basis, cost


def _python_stopper_replay(energies, recorded, eta, min_loss, sim_time):
    """Straightforward per-step replay of the in-scan transition."""
    stopped = False
    for e, r in zip(energies, recorded):
        if stopped:
            break
        improved = e < min_loss
        sim_time = 0.0 if improved else sim_time + eta
        if not np.isfinite(e) or (not improved and sim_time >= 100.0):
            stopped = True
        if improved:
            min_loss = min(min_loss, float(e))
        if not r:
            stopped = True
    return min_loss, sim_time, stopped


def test_chunked_stopper_state_matches_python_replay():
    """Run one chunk, replay its trace in plain Python, and check a second
    chunk launched by the driver behaves identically to one launched with
    the Python-replayed state."""
    basis, cost = _problem()
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(32, seed=0)
    eta, chunk = 1e-3, 40
    res = _train_pls_chunked(
        basis, cost, u0, as_key(5), eta, 100.0, 80, "off", None, "euler", chunk
    )
    # reproduce: chunk 1 with the driver's key schedule
    res1 = _train_pls_scan(
        basis, cost, u0, jax.random.fold_in(as_key(5), 0), eta, 100.0, 40, "off"
    )
    ml, st, stp = _python_stopper_replay(
        np.asarray(res1.energies, np.float64), np.asarray(res1.recorded),
        eta, float("inf"), 0.0,
    )
    assert not stp
    res2 = _train_pls_scan(
        basis, cost, res1.particles, jax.random.fold_in(as_key(5), 1),
        eta, 100.0, 40, "off", None, "euler",
        stopper_init=(jnp.asarray(ml, u0.dtype), jnp.asarray(st, u0.dtype), jnp.asarray(stp)),
    )
    np.testing.assert_allclose(
        np.asarray(res.particles), np.asarray(res2.particles), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.energies),
        np.concatenate([np.asarray(res1.energies), np.asarray(res2.energies)]),
        rtol=1e-12,
    )


def test_chunked_stops_launching_after_early_stop():
    basis, cost = _problem()
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(32, seed=0)
    # tiny patience (in simulation time): fires within the first chunks
    res = _train_pls_chunked(
        basis, cost, u0, as_key(3), 1e-3, 5e-3, 10_000, "off", None, "euler", 100
    )
    n_launched = res.energies.shape[0]
    assert n_launched < 10_000, "driver kept launching chunks after the stop"
    assert n_launched % 100 == 0
    assert not bool(res.recorded[-1])
    assert bool(jnp.isfinite(res.particles).all())


def test_chunked_law_matches_unchunked():
    """Same Markov chain, different key partitioning: after the same number
    of stable steps the particle moments agree to Monte-Carlo error."""
    basis, cost = _problem()
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(512, seed=0)
    eta, steps = 1e-3, 1500
    unchunked = _train_pls_scan(
        basis, cost, u0, as_key(7), eta, float("inf"), steps, "off"
    )
    chunked = _train_pls_chunked(
        basis, cost, u0, as_key(11), eta, float("inf"), steps, "off", None,
        "euler", 400,
    )
    mu_u = np.asarray(unchunked.particles, np.float64).mean(axis=1)
    mu_c = np.asarray(chunked.particles, np.float64).mean(axis=1)
    sd_u = np.asarray(unchunked.particles, np.float64).std(axis=1)
    sd_c = np.asarray(chunked.particles, np.float64).std(axis=1)
    np.testing.assert_allclose(mu_c, mu_u, atol=0.2 * (np.abs(mu_u).max() + 1.0))
    np.testing.assert_allclose(sd_c, sd_u, rtol=0.5, atol=0.1)


def test_train_pls_routes_long_runs_through_chunks(monkeypatch):
    import projected_langevin_sampling_tpu.training as T

    basis, cost = _problem()
    pls = PLS(basis=basis, cost=cost)
    u0 = pls.initialise_particles(16, seed=0)
    monkeypatch.setattr(T, "_SCAN_CHUNK_STEPS", 50)
    trained, energies = train_pls(pls, u0, 170, 1e-3, key=1)
    assert bool(jnp.isfinite(trained).all())
    assert len(energies) <= 170
    assert energies[-1] < energies[0]
